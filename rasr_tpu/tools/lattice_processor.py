"""lattice-processor tool (ref: src/Tools/LatticeProcessor/ — the legacy
pre-FLF lattice rescoring tool). Thin compatibility alias over the
flf-tool operations."""

from __future__ import annotations

from .flf_tool import FlfTool


class LatticeProcessorTool(FlfTool):
    name = "lattice-processor"
    description = "legacy lattice processing (alias of flf-tool)"


if __name__ == "__main__":
    raise SystemExit(LatticeProcessorTool.main())
