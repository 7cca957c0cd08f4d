"""Device mesh + sharding rules.

Replaces the reference's delegated parallelism — vLLM
``tensor_parallel_size`` (Rank-R1/run_setwise.py:109,125), HF
``device_map='auto'`` layer splitting (setwise.py:47), DeepSpeed ZeRO-0
DDP (ds_zero0_config.json) — with one declarative scheme: a 2-D
``('data', 'model')`` mesh over ICI, parameter PartitionSpecs per model
family, and batch sharding along 'data'. XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def make_hybrid_mesh(
    n_replica: int, n_data: int = 1, n_model: int = 1, devices=None
) -> Mesh:
    """3-axis ('replica', 'data', 'model') mesh — the multi-slice seam
    (SURVEY §5): 'replica' is pure data parallelism ACROSS slices whose
    collectives ride DCN; 'data'/'model' stay within a slice on ICI.
    Param pspecs are unchanged (nothing shards over 'replica'); batches
    shard over ('replica', 'data') via :func:`batch_pspec`, so XLA emits
    the gradient all-reduce as an ICI reduce + a DCN cross-slice reduce.

    Under a real multi-slice job (``jax.distributed.initialize`` on each
    host; process_count > 1) the device grid is built with
    ``mesh_utils.create_hybrid_device_mesh`` so slice-local devices land
    contiguously on the ICI axes; single-process (tests, the driver's
    virtual CPU mesh) reshapes the flat device list, which preserves the
    same program semantics.
    """
    import jax.experimental.mesh_utils as mesh_utils

    n = n_replica * n_data * n_model
    if devices is None and jax.process_count() > 1:
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, n_data, n_model),
            dcn_mesh_shape=(n_replica, 1, 1),
        )
        return Mesh(grid, ("replica", "data", "model"))
    devices = devices if devices is not None else jax.devices()
    if n > len(devices):
        raise ValueError(
            f"mesh {n_replica}x{n_data}x{n_model} needs {n} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(n_replica, n_data, n_model)
    return Mesh(grid, ("replica", "data", "model"))


def batch_pspec(mesh: Mesh) -> P:
    """Batch-dim PartitionSpec: over ('replica', 'data') when the mesh
    carries the multi-slice axis, else just 'data'."""
    axes = tuple(a for a in ("replica", "data") if a in mesh.axis_names)
    return P(axes if len(axes) > 1 else (axes[0] if axes else None))


# ---------------------------------------------------------------------------
# Parameter partition specs (tensor parallelism over the 'model' axis)
# ---------------------------------------------------------------------------
def t5_param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Megatron-style TP: attention heads and FFN inner dim sharded on
    'model'; embeddings/vocab sharded on 'model' along vocab."""

    def attn_specs(prefix: str = "") -> Dict[str, P]:
        return {
            prefix + "q": P(None, None, "model"),
            prefix + "k": P(None, None, "model"),
            prefix + "v": P(None, None, "model"),
            prefix + "o": P(None, "model", None),
        }

    def ffn_specs(layers: Dict[str, Any]) -> Dict[str, P]:
        out: Dict[str, P] = {}
        if "wi" in layers:
            out["wi"] = P(None, None, "model")
        if "wi_0" in layers:
            out["wi_0"] = P(None, None, "model")
            out["wi_1"] = P(None, None, "model")
        out["wo"] = P(None, "model", None)
        return out

    def stack_specs(layers: Dict[str, Any], dec: bool) -> Dict[str, P]:
        specs: Dict[str, P] = {
            "ln1": P(None, None),
            "ln2": P(None, None),
            **attn_specs(),
            **ffn_specs(layers),
        }
        if dec:
            specs["ln3"] = P(None, None)
            specs.update({("c" + k): v for k, v in attn_specs().items()})
        # Packed int8 leaves (quant.T5_PACKS) exist only on the
        # single-chip kernel path — a contiguous 'model' split of the
        # packed axis would mix q/k/v — so they stay replicated; the
        # 1-device mesh makes that a no-op.
        for name in ("qkv", "ckv", "wi_g"):
            if name in layers:
                specs[name] = P(None, None, None)
        # Only leaves that actually exist (packing removes the per-site
        # ones it merged).
        specs = {k: v for k, v in specs.items() if k in layers}
        # int8 quantization: per-output-channel scales [L, 1, out] shard
        # along the same axis as the weight's output dim.
        for name in list(specs):
            sk = name + "_scale"
            if sk in layers:
                w_spec = specs[name]
                specs[sk] = P(
                    None, None, w_spec[2] if len(w_spec) == 3 else None
                )
        return specs

    specs: Dict[str, Any] = {
        "shared": P("model", None),
        "encoder": {
            "rel_bias": P(None, "model"),
            "layers": stack_specs(params["encoder"]["layers"], dec=False),
            "final_ln": P(None),
        },
        "decoder": {
            "rel_bias": P(None, "model"),
            "layers": stack_specs(params["decoder"]["layers"], dec=True),
            "final_ln": P(None),
        },
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "model")
    return specs


def decoder_param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    layers = params["layers"]
    lspecs: Dict[str, P] = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "w_gate": P(None, None, "model"),
        "w_up": P(None, None, "model"),
        "w_down": P(None, "model", None),
    }
    for b in ("bq", "bk", "bv"):
        if b in layers:
            lspecs[b] = P(None, "model")
    for qn in ("q_norm", "k_norm"):
        if qn in layers:
            lspecs[qn] = P(None, None)
    # int8 weight-only quantization: per-output-channel scales [L, 1, out]
    # shard along the same axis as the weight's output dim.
    for name in list(lspecs):
        sk = name + "_scale"
        if sk in layers:
            w_spec = lspecs[name]
            lspecs[sk] = P(None, None, w_spec[2] if len(w_spec) == 3 else None)
    # int4 nibble packing interleaves k-groups along the packed input dim
    # (ops/int4_matmul.py::pack_int4), so input-dim sharding would split
    # groups; shard packed weights and their group scales on the OUTPUT
    # dim only (GSPMD re-shards the consuming matmul as needed — int4 is
    # a single-chip serving feature, the mesh path is correctness-only).
    for name in list(lspecs):
        sk4 = name + "_scale4"
        if sk4 in layers:
            lspecs[name] = P(None, None, "model")
            lspecs[sk4] = P(None, None, "model")
    specs: Dict[str, Any] = {
        "embed": P("model", None),
        "layers": lspecs,
        "final_ln": P(None),
    }
    if "embed_scale" in params:  # int8 head (quant._quantize_head)
        specs["embed_scale"] = P("model", None)
    if "lm_head" in params:
        specs["lm_head"] = P(None, "model")
    if "lm_head_scale" in params:
        specs["lm_head_scale"] = P(None, "model")
    return specs


def shard_params(params, pspecs, mesh: Mesh):
    """device_put the param pytree with NamedShardings."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, pspecs
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for activations/inputs (multi-slice aware)."""
    return NamedSharding(mesh, batch_pspec(mesh))


def batch_divisor(mesh: Mesh) -> int:
    """Devices the batch axis shards over (replica * data)."""
    return mesh.shape.get("replica", 1) * mesh.shape.get("data", 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
