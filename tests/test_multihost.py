"""Real multi-process execution: 2 jax.distributed processes × 4 CPU
devices, one DP VQ-VAE train step over an 8-device global mesh with
per-host data sharding, plus a sharded checkpoint save/restore.

This exercises what single-process mesh tests can't: the
``jax.distributed.initialize`` env plumbing
(parallel/distributed.py — the deepspeed/NCCL replacement, reference
run_vqvae.py:831-846), ``host_shard_info``-driven per-host loading, and
``shard_batch``'s ``make_array_from_process_local_data`` path.  The
losses from both processes must agree with each other and with a
single-process 8-device run of the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from synthanatomy_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed(), "expected a 2-process job"
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from synthanatomy_tpu.models.vqvae import BaselineVQVAE
from synthanatomy_tpu.parallel.mesh import (
    host_shard_info, make_mesh, put_replicated, shard_batch,
)
from synthanatomy_tpu.train import checkpoints as C
from synthanatomy_tpu.train.vqvae_steps import (
    create_vqvae_train_state, make_vqvae_train_step,
)

shard_id, num_shards = host_shard_info()
assert num_shards == 2

model = BaselineVQVAE(
    n_levels=1, downsample_parameters=((4, 2, 1, 1),),
    upsample_parameters=((4, 2, 1, 0, 1),),
    n_embed=16, embed_dim=4, n_channels=8, n_res_channels=8,
    n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
)
state, g_tx, _ = create_vqvae_train_state(model, jax.random.key(0), (8, 8, 8))
step = make_vqvae_train_step(model, g_tx, loss_name="mse")
sched = {"lr": 1e-3, "decay": 0.5, "commitment_cost": 0.25,
         "gdl_factor": 0.0, "epoch": 0}

# global batch of 8, split per host by host_shard_info
full = np.random.default_rng(0).uniform(size=(8, 8, 8, 8, 1)).astype(np.float32)
local = full[shard_id * 4 : (shard_id + 1) * 4]

mesh = make_mesh((8,), ("data",))
xs = shard_batch(mesh, local)
assert xs.shape == (8, 8, 8, 8, 1)  # global shape reassembled
state_r = put_replicated(mesh, state)
with jax.set_mesh(mesh):
    new_state, metrics = jax.jit(step)(state_r, xs, sched)
loss = float(metrics["Loss-MSE-Reconstruction"])

# sharded checkpoint save + restore (multi-process orbax)
ckpath = C.save_checkpoint(os.environ["WORKDIR"], new_state, 0)
restored = C.load_checkpoint(ckpath, put_replicated(mesh, state))
a = np.asarray(jax.device_get(restored.g_params["encoder_conv_0"]["kernel"]))
b = np.asarray(jax.device_get(new_state.g_params["encoder_conv_0"]["kernel"]))
np.testing.assert_allclose(a, b)

out = {"process": jax.process_index(), "loss": loss}
with open(os.path.join(os.environ["WORKDIR"], f"out_{shard_id}.json"), "w") as f:
    json.dump(out, f)
print("WORKER_OK", shard_id)
"""


def test_two_process_dp_step_and_checkpoint(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO=REPO,
            WORKDIR=str(tmp_path),
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out

    results = [
        json.load(open(tmp_path / f"out_{i}.json")) for i in range(2)
    ]
    # both processes computed the same global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-process 8-device reference on the same global batch
    import jax
    import jax.numpy as jnp

    from synthanatomy_tpu.models.vqvae import BaselineVQVAE
    from synthanatomy_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from synthanatomy_tpu.train.vqvae_steps import (
        create_vqvae_train_state,
        make_vqvae_train_step,
    )

    model = BaselineVQVAE(
        n_levels=1, downsample_parameters=((4, 2, 1, 1),),
        upsample_parameters=((4, 2, 1, 0, 1),),
        n_embed=16, embed_dim=4, n_channels=8, n_res_channels=8,
        n_res_layers=1, dtype=jnp.float32, use_pallas_vq=False,
    )
    state, g_tx, _ = create_vqvae_train_state(model, jax.random.key(0), (8, 8, 8))
    step = make_vqvae_train_step(model, g_tx, loss_name="mse")
    sched = {"lr": 1e-3, "decay": 0.5, "commitment_cost": 0.25,
             "gdl_factor": 0.0, "epoch": 0}
    full = np.random.default_rng(0).uniform(size=(8, 8, 8, 8, 1)).astype(np.float32)
    mesh = make_mesh((8,), ("data",))
    xs = shard_batch(mesh, full)
    with jax.set_mesh(mesh):
        _, metrics = jax.jit(step)(
            jax.device_put(state, replicated(mesh)), xs, sched
        )
    ref_loss = float(metrics["Loss-MSE-Reconstruction"])
    assert results[0]["loss"] == pytest.approx(ref_loss, rel=1e-5)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER_SP = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from synthanatomy_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed(), "expected a 2-process job"
assert jax.process_count() == 2 and len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
import optax
from synthanatomy_tpu.models.performer import Performer
from synthanatomy_tpu.parallel.mesh import make_mesh, put_replicated
from synthanatomy_tpu.parallel.sequence_parallel import make_sp_train_step
from synthanatomy_tpu.train.transformer_steps import (
    create_transformer_train_state,
)

seq = 32  # 4 seq shards x window 8
model = Performer(
    num_tokens=17, max_seq_len=seq + 1, dim=32, depth=2, heads=4,
    dim_head=8, local_attn_heads=2, local_window_size=8,
    nb_features=8, dtype=jnp.float32, scan_chunk=8,
)
state, _ = create_transformer_train_state(
    model, jax.random.key(0), seq + 1, learning_rate=1e-3
)
tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
state = state.replace(opt_state=tx.init(state.params))

# DP x SP over BOTH processes: 'data' spans hosts, 'seq' spans the
# local devices of each — the attention halo/prefix collectives cross
# the process boundary
mesh = make_mesh((2, 4), ("data", "seq"))
sp_step = make_sp_train_step(model, tx, mesh, seq, data_axis="data")

rng = np.random.default_rng(3)
inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
state_r = put_replicated(mesh, state)
with jax.set_mesh(mesh):
    _, metrics = jax.jit(sp_step)(state_r, inputs, targets, {"lr": 1e-3})
loss = float(jax.device_get(metrics["Loss"]))

out = {"process": jax.process_index(), "loss": loss}
with open(
    os.path.join(os.environ["WORKDIR"], f"sp_out_{jax.process_index()}.json"),
    "w",
) as f:
    json.dump(out, f)
print("WORKER_SP_OK", jax.process_index())
"""


def test_two_process_sp_step(tmp_path):
    """Sequence-parallel training across a REAL process boundary: a
    (2 hosts × 4 devices) DP×SP mesh where the FAVOR prefix-state
    all_gather and the local-window halo ppermute cross hosts.  Both
    processes must agree, and match the single-process step."""
    port = _free_port()
    script = tmp_path / "worker_sp.py"
    script.write_text(WORKER_SP)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO=REPO,
            WORKDIR=str(tmp_path),
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_SP_OK {pid}" in out

    results = [
        json.load(open(tmp_path / f"sp_out_{i}.json")) for i in range(2)
    ]
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-process single-device reference on the same batch
    import jax
    import jax.numpy as jnp
    import optax

    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    seq = 32
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=32, depth=2, heads=4,
        dim_head=8, local_attn_heads=2, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq + 1, learning_rate=1e-3
    )
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(3)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    ref_step = make_transformer_train_step(model, tx)
    _, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )
    assert results[0]["loss"] == pytest.approx(
        float(ref_metrics["Loss"]), rel=1e-5
    )


WORKER_PP = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from synthanatomy_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed(), "expected a 2-process job"
assert jax.process_count() == 2 and len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh
from synthanatomy_tpu.models.performer import Performer
from synthanatomy_tpu.parallel.mesh import put_replicated
from synthanatomy_tpu.parallel.pipeline_parallel import (
    make_pp_train_step, pack_pp_state,
)
from synthanatomy_tpu.train.transformer_steps import (
    create_transformer_train_state,
)

seq = 20
model = Performer(
    num_tokens=17, max_seq_len=24, dim=32, depth=4, heads=2,
    dim_head=8, local_attn_heads=1, local_window_size=6,
    nb_features=8, dtype=jnp.float32, scan_chunk=8,
)
state, _ = create_transformer_train_state(
    model, jax.random.key(0), 24, learning_rate=1e-3
)
tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
state = state.replace(opt_state=tx.init(state.params))

# 4-stage pipe spanning BOTH hosts x 2-way DP: the stage->stage
# activation ppermute crosses the process boundary
mesh = Mesh(
    np.asarray(jax.devices()).reshape(4, 2), ("pipe", "data")
)
pp_step = make_pp_train_step(
    model, tx, mesh, n_microbatches=4, data_axis="data"
)
packed = put_replicated(mesh, pack_pp_state(model, state))

rng = np.random.default_rng(0)
inputs = jnp.asarray(rng.integers(0, 16, (8, seq)), jnp.int32)
targets = jnp.asarray(rng.integers(0, 16, (8, seq)), jnp.int32)
with jax.set_mesh(mesh):
    _, metrics = jax.jit(pp_step)(packed, inputs, targets, {"lr": 1e-3})
loss = float(jax.device_get(metrics["Loss"]))

with open(
    os.path.join(os.environ["WORKDIR"], f"pp_out_{jax.process_index()}.json"),
    "w",
) as f:
    json.dump({"loss": loss}, f)
print("WORKER_PP_OK", jax.process_index())
"""


def test_two_process_pp_step(tmp_path):
    """GPipe training across a REAL process boundary: the 4-stage pipe
    spans both hosts, so the fill-drain ppermute moves activations
    across processes.  Both agree and match the single-device step."""
    port = _free_port()
    script = tmp_path / "worker_pp.py"
    script.write_text(WORKER_PP)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO=REPO,
            WORKDIR=str(tmp_path),
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_PP_OK {pid}" in out

    results = [
        json.load(open(tmp_path / f"pp_out_{i}.json")) for i in range(2)
    ]
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-device reference
    import jax
    import jax.numpy as jnp
    import optax

    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    model = Performer(
        num_tokens=17, max_seq_len=24, dim=32, depth=4, heads=2,
        dim_head=8, local_attn_heads=1, local_window_size=6,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), 24, learning_rate=1e-3
    )
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.integers(0, 16, (8, 20)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (8, 20)), jnp.int32)
    ref_step = make_transformer_train_step(model, tx)
    _, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, None, {"lr": 1e-3}
    )
    assert results[0]["loss"] == pytest.approx(
        float(ref_metrics["Loss"]), rel=1e-5
    )


WORKER_TP = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

from synthanatomy_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed(), "expected a 2-process job"
assert jax.process_count() == 2 and len(jax.devices()) == 8

import jax.numpy as jnp
import numpy as np
import optax
from synthanatomy_tpu.models.ordering import Ordering
from synthanatomy_tpu.models.performer import Performer
from synthanatomy_tpu.parallel.mesh import make_mesh, put_replicated, put_sharded
from synthanatomy_tpu.parallel.tensor_parallel import (
    make_tp_train_step, pack_tp_params, tp_param_specs,
)
from synthanatomy_tpu.train.transformer_steps import (
    create_transformer_train_state,
)

# PAPER block/embedding form, Megatron-sharded over BOTH processes:
# the f/g conjugate psums cross the host boundary
shape = (2, 3, 4)
seq = int(np.prod(shape))
ordering = Ordering("raster_scan", 3, shape)
model = Performer(
    num_tokens=17, max_seq_len=seq + 1, dim=64, depth=2, heads=16,
    dim_head=4, local_attn_heads=8, local_window_size=8,
    nb_features=8, dtype=jnp.float32, scan_chunk=8,
    use_rezero=True, spatial_position_emb="absolute",
    spatial_shape=shape, ordering=ordering,
    conditioning_num_tokens=(5,), conditioning_type="bos_replacement",
)
state, _ = create_transformer_train_state(
    model, jax.random.key(0), seq, learning_rate=1e-3,
    conditionings=[jnp.zeros((1,), jnp.int32)],
)
p = dict(state.params)
for i in range(2):
    blk = dict(p[f"block_{i}"])
    blk["g_attn"] = jnp.asarray([0.7], jnp.float32)
    blk["g_ff"] = jnp.asarray([0.5], jnp.float32)
    p[f"block_{i}"] = blk
state = state.replace(params=p)
tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)

n_sh = 8
mesh = make_mesh((n_sh,), ("model",))
packed = pack_tp_params(model, state.params, n_sh)
packed = put_sharded(mesh, packed, tp_param_specs(packed))
state = state.replace(
    params=packed,
    opt_state=jax.jit(tx.init)(packed),
    favor=put_replicated(mesh, state.favor),
    step=put_replicated(mesh, state.step),
    rng=put_replicated(mesh, state.rng),
)
tp_step = make_tp_train_step(model, tx, mesh)

rng = np.random.default_rng(23)
inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
conds = [jnp.asarray([1, 3], jnp.int32)]
with jax.set_mesh(mesh):
    _, metrics = jax.jit(tp_step)(state, inputs, targets, {"lr": 1e-3}, conds)
loss = float(jax.device_get(metrics["Loss"]))

out = {"process": jax.process_index(), "loss": loss}
with open(
    os.path.join(os.environ["WORKDIR"], f"tp_out_{jax.process_index()}.json"),
    "w",
) as f:
    json.dump(out, f)
print("WORKER_TP_OK", jax.process_index())
"""


def test_two_process_tp_step(tmp_path):
    """Manual Megatron TP training across a REAL process boundary
    (8 model shards over 2 hosts × 4 devices) with the full PAPER
    feature set — ReZero, learned spatial tables, bos_replacement
    conditioning.  Both processes must agree and match the
    single-device step."""
    port = _free_port()
    script = tmp_path / "worker_tp.py"
    script.write_text(WORKER_TP)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO=REPO,
            WORKDIR=str(tmp_path),
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_TP_OK {pid}" in out

    results = [
        json.load(open(tmp_path / f"tp_out_{i}.json")) for i in range(2)
    ]
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-device reference on the same batch + conditioning
    import jax
    import jax.numpy as jnp
    import optax

    from synthanatomy_tpu.models.ordering import Ordering
    from synthanatomy_tpu.models.performer import Performer
    from synthanatomy_tpu.train.transformer_steps import (
        create_transformer_train_state,
        make_transformer_train_step,
    )

    shape = (2, 3, 4)
    seq = int(np.prod(shape))
    ordering = Ordering("raster_scan", 3, shape)
    model = Performer(
        num_tokens=17, max_seq_len=seq + 1, dim=64, depth=2, heads=16,
        dim_head=4, local_attn_heads=8, local_window_size=8,
        nb_features=8, dtype=jnp.float32, scan_chunk=8,
        use_rezero=True, spatial_position_emb="absolute",
        spatial_shape=shape, ordering=ordering,
        conditioning_num_tokens=(5,), conditioning_type="bos_replacement",
    )
    state, _ = create_transformer_train_state(
        model, jax.random.key(0), seq, learning_rate=1e-3,
        conditionings=[jnp.zeros((1,), jnp.int32)],
    )
    p = dict(state.params)
    for i in range(2):
        blk = dict(p[f"block_{i}"])
        blk["g_attn"] = jnp.asarray([0.7], jnp.float32)
        blk["g_ff"] = jnp.asarray([0.5], jnp.float32)
        p[f"block_{i}"] = blk
    state = state.replace(params=p)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(23)
    inputs = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, 16, (2, seq)), jnp.int32)
    conds = [jnp.asarray([1, 3], jnp.int32)]
    ref_step = make_transformer_train_step(model, tx)
    _, ref_metrics = jax.jit(ref_step)(
        state, inputs, targets, conds, {"lr": 1e-3}
    )
    assert results[0]["loss"] == pytest.approx(
        float(ref_metrics["Loss"]), rel=1e-5
    )
