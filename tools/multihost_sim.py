"""Multi-host DCN simulation: 2 local processes over jax.distributed.

SURVEY.md §2.4/§5 comm rows: multi-host training is `jax.distributed.
initialize()` + the same mesh code (ICI within a slice, DCN across hosts).
No multi-host hardware exists in this environment, so this tool simulates
it the supported way: two OS processes, each exposing 4 virtual CPU
devices, joined through the distributed coordinator into one 8-device
global mesh — the exact code path (multi-controller runtime, cross-process
collectives over the gRPC "DCN") a 2-host run takes, minus the physical
link.

Each worker trains 3 sharded FM steps on identical seeded synthetic data
and reports the replicated loss trajectory and a global table checksum;
the launcher compares them against a single-process 8-fake-device run of
the same steps.  Exercised by tests/test_multihost.py.

Usage:
  python tools/multihost_sim.py            # launcher (spawns 2 workers)
  python tools/multihost_sim.py worker <pid> <port>   # internal
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 3
BATCH = 64
SEED = 5
LOCAL_DEVICES = 4
NUM_PROC = 2


def _train(mesh_devices=None):
    """Build the fixed tiny workload and run STEPS sharded steps.

    Returns (losses list, checksum float). Works in both single-process
    (8 fake devices) and multi-process (4 local + 4 remote) modes — the
    mesh code is identical, which is the point.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deepctr_tpu.data import make_schema, synthetic
    from deepctr_tpu.models import FMModel
    from deepctr_tpu.optim import SparseAdagrad
    from deepctr_tpu.parallel import (
        init_sharded_state,
        make_data_mesh,
        make_sharded_train_step,
    )
    from deepctr_tpu.parallel.mesh import data_sharding

    schema = make_schema([("a", 16), ("b", 48), ("c", 96), ("tags", 24, 2)])
    ds = synthetic.generate(schema, num_examples=BATCH * STEPS, k=3, seed=SEED)
    model = FMModel(k=3)
    sopt, dopt = SparseAdagrad(0.1), optax.sgd(0.05)
    mesh = make_data_mesh(devices=mesh_devices)
    state = init_sharded_state(model, schema, sopt, dopt, mesh, seed=SEED)
    step = make_sharded_train_step(
        model, schema, sopt, dopt, mesh, capacity_factor=8.0
    )
    s = data_sharding(mesh)
    losses = []
    for i in range(STEPS):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        # device_put with a global sharding: every process provides the same
        # full host batch; each fills only its addressable shards — this is
        # the multi-controller input-feeding contract
        ids = jax.device_put(ds.ids[sl], s)
        y = jax.device_put(ds.labels[sl], s)
        w = jax.device_put(np.ones(BATCH, np.float32), s)
        state, (loss, dropped) = step(state, ids, y, w)
        losses.append(float(loss))
        assert int(dropped) == 0
    # global checksum of the sharded table as a replicated scalar (the full
    # table is not addressable from one process)
    checksum = float(
        jax.jit(lambda t: jnp.sum(jnp.abs(t)) + jnp.sum(t * t))(state.table)
    )
    return losses, checksum


def worker(process_id: int, port: int) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NUM_PROC,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROC
    assert len(jax.devices()) == NUM_PROC * LOCAL_DEVICES  # global view
    losses, checksum = _train(mesh_devices=jax.devices())
    print("RESULT " + json.dumps({"pid": process_id, "losses": losses,
                                  "checksum": checksum}), flush=True)


def launch() -> int:
    port = 17737 + (os.getpid() % 500)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    # repo only — deliberately NOT inheriting /root/.axon_site: its
    # sitecustomize registers the tunneled-TPU plugin whose own coordination
    # hooks conflict with a local jax.distributed CPU cluster
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(i),
             str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NUM_PROC)
    ]
    results = {}
    outs = []
    deadline = time.time() + 480
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(5.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    if len(results) != NUM_PROC:
        for i, out in enumerate(outs):
            print(f"--- worker {i} output ---\n{out}")
    assert len(results) == NUM_PROC, f"workers failed: {sorted(results)}"

    # reference: single-process, 8 fake devices (the CI-standard mode)
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={NUM_PROC * LOCAL_DEVICES}",
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    ref_losses, ref_checksum = _train()

    import numpy as np

    for pid in range(NUM_PROC):
        np.testing.assert_allclose(results[pid]["losses"], ref_losses,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(results[pid]["checksum"], ref_checksum,
                                   rtol=1e-5)
    print(
        "MULTIHOST SIM OK — 2-process x 4-device DCN trajectory == "
        f"single-process 8-device: losses={ref_losses}"
    )
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(launch())
