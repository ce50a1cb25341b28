"""Real multi-process jax.distributed test on localhost (SURVEY §4:
"multi-host without a cluster — jax.distributed multi-process tests via
subprocess on localhost"). Two OS processes x two CPU devices form one
global (4,1) mesh; the framework's DP-EM psum reduction and counter
psum must equal the single-process oracle — the collective replacement
for the reference's accumulator-file merge, validated across a real
process boundary (Gloo collectives over the loopback)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(
        f"localhost:{{port}}", num_processes=2, process_id=pid
    )
    import numpy as np
    from jax.sharding import Mesh
    from rasr_tpu.models.gmm import MixtureSet
    from rasr_tpu.parallel.sharded import dp_accumulate, psum_counters
    from rasr_tpu.train.em import GmmAccumulator, accumulate

    rng = np.random.default_rng(0)  # same global batch in every process
    M, K, D, N = 4, 2, 6, 64
    model = MixtureSet(
        means=rng.normal(size=(M, K, D)).astype(np.float32),
        variances=(0.5 + rng.uniform(size=(M, K, D))).astype(np.float32),
        weights=np.full((M, K), 0.5, np.float32),
        num_densities=np.full(M, K, np.int32),
    )
    feats = rng.normal(size=(N, D)).astype(np.float32)
    labels = rng.integers(0, M, size=N).astype(np.int32)

    mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
    count, s1, s2 = dp_accumulate(mesh, model, feats, labels)

    acc = GmmAccumulator.zeros(M, K, D)
    accumulate(acc, model, feats, labels)
    assert np.allclose(count, acc.count, rtol=1e-4, atol=1e-4)
    assert np.allclose(s1, acc.sum, rtol=1e-4, atol=1e-4)
    assert np.allclose(s2, acc.sumsq, rtol=1e-3, atol=1e-3)

    wer = psum_counters(mesh, np.tile([[3.0, 100.0]], (4, 1)).astype(np.float32))
    assert np.allclose(np.asarray(wer), [12.0, 400.0])
    print(f"MP-OK {{pid}}")
    """
)


def test_two_process_dp_em(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    import socket

    with socket.socket() as sk:  # reserve a genuinely free port
        sk.bind(("localhost", 0))
        port = sk.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MP-OK {i}" in out
