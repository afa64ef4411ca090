"""Device mesh + sharding rules (data parallel x tensor parallel over ICI).

The reference has NO distributed execution (single-GPU jobs scaled out via a
SLURM array; SURVEY.md §2.14). Scale-out here is first-class and TPU-native:
a jax.sharding.Mesh with axes ("data", "model"); parameters get tensor-
parallel NamedShardings (attention heads / FFN split over "model"), batches
shard over "data", and XLA GSPMD inserts the ICI collectives (all-reduce for
DP grads, all-gather/reduce-scatter around TP matmuls) — no hand-written
comm backend.

Layout rules (weights are [d_in, d_out]; layer stacks carry a leading L):
- q/k/v (and fc1):  split d_out over "model"  -> column parallel
- o    (and fc2):  split d_in  over "model"  -> row parallel (psum by XLA)
- token_embed [V, d]: split V over "model" (sharded logits matmul)
- conv stems, positions, LayerNorms, LoRA bank: replicated (small)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh over available devices; defaults to pure data parallelism."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def mesh_from_flags(dp: int, tp: int, dcn_dp: int = 1) -> Mesh | None:
    """CLI helper (--dp/--tp/--dcn_dp flags): a mesh over the first
    dcn_dp*dp*tp visible devices, or None when the product is 1
    (single-device run). With --dcn_dp > 1 the mesh gains a leading
    "replica" axis laid out over DCN (multi-slice / multi-host DP; see
    distributed.make_multislice_mesh)."""
    want = dcn_dp * dp * tp
    if want <= 1:
        return None
    devices = jax.devices()
    if len(devices) < want:
        raise SystemExit(
            f"error: --dcn_dp {dcn_dp} x --dp {dp} x --tp {tp} needs {want} "
            f"devices but only {len(devices)} are visible "
            f"({devices[0].platform}); for a virtual-device dry run set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={want} "
            f"with JAX_PLATFORMS=cpu")
    if dcn_dp > 1:
        from sar_tpu.parallel.distributed import make_multislice_mesh
        return make_multislice_mesh(dp=dp, tp=tp, replicas=dcn_dp,
                                    devices=devices[:want])
    return make_mesh(n_data=dp, n_model=tp, devices=devices[:want])


def _layer_specs(prefix: str) -> dict:
    """PartitionSpecs for one stacked layer dict (leading L axis)."""
    col = {"w": P(None, None, "model"), "b": P(None, "model")}
    col_nb = {"w": P(None, None, "model")}
    row = {"w": P(None, "model", None), "b": P(None)}
    ln = {"scale": P(None), "bias": P(None)}
    if prefix == "encoder":
        return {
            "attn_ln": ln, "q": col, "k": col_nb, "v": col, "o": row,
            "mlp_ln": ln, "fc1": col, "fc2": row,
        }
    return {
        "self_ln": ln, "self_q": col, "self_k": col_nb, "self_v": col,
        "self_o": row,
        "cross_ln": ln, "cross_q": col, "cross_k": col_nb, "cross_v": col,
        "cross_o": row,
        "mlp_ln": ln, "fc1": col, "fc2": row,
    }


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a whisper param pytree."""
    rep2 = P(None, None)
    specs = {
        "encoder": {
            "conv1": {"w": P(None, None, "model"), "b": P("model")},
            "conv2": {"w": P(None, None, "model"), "b": P("model")},
            "pos_embed": rep2,
            "layers": _layer_specs("encoder"),
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "decoder": {
            "token_embed": P("model", None),
            "pos_embed": rep2,
            "layers": _layer_specs("decoder"),
            "ln": {"scale": P(None), "bias": P(None)},
        },
    }
    # conv2 input dim is d_model (sharded producer) but keep weights gathered;
    # XLA re-shards activations as needed.
    return specs


def lora_specs(lora: dict) -> dict:
    """Replicate the LoRA bank (tiny: L*A*d*r)."""
    return jax.tree.map(lambda x: P(*([None] * x.ndim)), lora)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a param pytree on the mesh with TP shardings."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_lora(lora: dict, mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*([None] * x.ndim)))),
        lora)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over every non-"model" mesh axis."""
    from sar_tpu.parallel.distributed import batch_axis_names
    return NamedSharding(mesh, P(batch_axis_names(mesh)))


def shard_batch(batch, mesh: Mesh):
    """device_put every leading-batch array in a batch dict."""
    from sar_tpu.parallel.distributed import batch_axis_names
    axes = batch_axis_names(mesh)

    def put(x):
        spec = P(*([axes] + [None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
