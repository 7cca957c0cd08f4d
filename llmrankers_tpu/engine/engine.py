"""Batched scoring engine: the device-facing half of the framework.

Everything the reference does with per-call ``tokenizer(...).to(device)``
+ ``llm.generate`` round trips (setwise.py:87-95, pointwise.py:73-124,
pairwise.py:91-99) becomes four fixed-shape jitted programs:

  * ``score_labels``  — one forward, gather label-token logits at the
    first free decoder position (setwise/listwise likelihood, yes_no,
    monoT5/duoT5 heads).
  * ``sequence_nll``  — teacher-forced decoder NLL (pointwise qlm).
  * ``generate``      — greedy decode with KV cache (generation scoring,
    RankGPT permutations, Rank-R1 reasoning).
  * decoder-only variants of the above.

Host-side tokenization pads into (batch, length) buckets so each bucket
compiles once; the jit cache is keyed on bucket shape. Batches ride a
``('data', 'model')`` mesh when one is provided — batch sharded over
'data', parameters tensor-parallel over 'model' (SURVEY.md §2.5).
"""
from __future__ import annotations

import functools
import logging
import sys
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import decoder as dec_mod
from ..models import t5 as t5_mod
from ..models.config import DecoderConfig, T5Config
from ..parallel import mesh as mesh_mod
from . import generate as gen_mod
from .tokenizer import Tokenizer

logger = logging.getLogger(__name__)

# Finer length granularity pays: the benchmark's ~600-token setwise
# prompts ran 2x faster in a 640 bucket than spilling into 1024.
DEFAULT_LEN_BUCKETS = (64, 128, 256, 384, 512, 640, 768, 1024, 1536, 2048, 4096)
DEFAULT_BATCH_BUCKETS = (8, 32, 64, 128, 256, 512)


def _qkernel_backend() -> bool:
    """Quantized Pallas kernels run on TPU (Mosaic). The force flag lets
    CPU tests exercise the SAME kernel dataflow (interpret mode) —
    including the shard_map mesh paths on virtual devices — so the
    engine never silently swaps kernels by device count untested."""
    import os

    return (
        jax.default_backend() == "tpu"
        or os.environ.get("LLMRANKERS_FORCE_QKERNELS") == "1"
    )


def _is_oom(e: BaseException) -> bool:
    """True for XLA device-memory exhaustion (any jaxlib spelling)."""
    s = str(e)
    return (
        "RESOURCE_EXHAUSTED" in s
        or "Resource exhausted" in s
        or "out of memory" in s.lower()
    )


def _bucket(n: int, ladder: Sequence[int]) -> int:
    """Smallest ladder entry >= n. Beyond the ladder top, round UP to the
    next multiple of 512 instead of clamping — clamping would silently
    truncate rows (a Rank-R1 num_child=19 prompt is ~11k tokens, past the
    default 4096 top; vLLM runs it with max_model_len=10000,
    run_setwise.py:117). Each new size costs one compile, as any bucket
    does; the engine caps rows at the model context elsewhere."""
    for b in ladder:
        if n <= b:
            return b
    return -(-n // 512) * 512


@dataclass
class BatchStats:
    """Token accounting for one engine call (unpadded true counts)."""

    prompt_tokens: int = 0
    completion_tokens: int = 0


# Sentinel: "don't consult the cross-wave prefix-KV cache" (None is a
# valid cache key — it means the base, adapter-less weights).
_NO_PKV = object()


class ScoringEngine:
    """One model + tokenizer + mesh; stateless jitted compute underneath."""

    def __init__(
        self,
        kind: str,  # 't5' | 'decoder'
        cfg,
        params,
        tokenizer: Tokenizer,
        mesh=None,
        # a rung ladder, or "auto"/"auto:K" to start from the default
        # ladder and re-plan it DP-optimally from observed row lengths
        # (utils/bucketplan.py) once auto_plan_rows rows have been seen
        len_buckets: Any = DEFAULT_LEN_BUCKETS,
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
        auto_plan_rows: int = 4096,
        max_batch_tokens: int = 2**17,
        use_flash: str = "auto",  # 'auto' | 'on' | 'off'
        prefix_share: bool = True,  # share prompt-prefix KV (decoder kind)
        quantize: Optional[str] = None,  # None | 'int8' | 'int4' (weights)
        kv_quantize: Optional[str] = None,  # None|'int8'|'int4' (decoder KV)
        spec_lookup: int = 0,  # >0: prompt-lookup speculative decoding
        # with K-token drafts (decoder generation; vLLM ngram-spec parity)
        max_cached_adapters: int = 1,  # merged-weight copies kept on device
        # Cross-wave prefix-KV cache budget (decoder kind): unique prompt
        # prefixes' per-layer K/V kept on device ACROSS engine calls, so
        # a sort's successive waves (heapsort rounds re-scoring the same
        # query head) skip the prefix forward — vLLM's cross-request
        # PagedAttention prefix caching (setwise.py:450-454). 0 disables.
        prefix_cache_mb: int = 256,
        # AWQ-style activation-aware calibration prompts (decoder +
        # quantize only): before quantizing, fold per-(layer, site-group)
        # scales fitted on these prompts into the weights
        # (models/awq.py) — the vLLM-served "*-AWQ" checkpoint
        # equivalent, calibrated in-framework on in-domain prompts.
        awq_calib: Optional[Sequence[str]] = None,
    ):
        import dataclasses
        import os

        if awq_calib and quantize is not None:
            if kind != "decoder":
                raise ValueError("awq_calib targets decoder models")
            from ..models import awq as awq_mod

            ids, mask = awq_mod.calib_batch_from_texts(tokenizer, awq_calib)
            params, awq_info = awq_mod.calibrate(
                params, cfg, ids, mask, mode=quantize
            )
            logger.info(
                "AWQ calibration (%s, %d prompts): quantization-error "
                "ratios vs uncalibrated %s", quantize, len(awq_calib),
                awq_info,
            )
            self.awq_info = awq_info
        if quantize is not None:
            from ..models import quant as quant_mod

            if quantize not in ("int8", "int4"):
                raise ValueError(f"unknown quantize mode {quantize!r}")
            if quantize == "int4":
                if kind != "decoder":
                    raise ValueError(
                        "quantize='int4' targets decoder models (T5 scoring"
                        " is compute-bound on the int8 MXU — use 'int8')"
                    )
                # Group-wise W4: decode is weight-streaming-bound, so
                # quartered weight bytes ~ 2x the int8 decode ceiling.
                # On TPU the matmul sites run the Pallas W4A8 kernel
                # (in-VMEM nibble unpack, int8-MXU dots) — per-device
                # under shard_map on a mesh (column-parallel only; sites
                # whose local N doesn't tile fall back per-site, see
                # quant.qmm). CPU takes the XLA unpack fallback.
                params = jax.jit(quant_mod.quantize_decoder_params_int4)(
                    params
                )
                if (
                    _qkernel_backend()
                    and os.environ.get("LLMRANKERS_NO_INT4_KERNEL") != "1"
                ):
                    cfg = dataclasses.replace(cfg, int4_kernel=True)
            elif kind == "decoder":
                # Weight-only W8A16: decode is weight-streaming-bound, so
                # halved weight bytes ~ doubled decode throughput; XLA
                # fuses the dequant into the matmul producer. Prefill's
                # large-M GEMMs additionally ride the W8A8 int8-MXU
                # kernel on TPU (quant.qmm dispatch) — per-device under
                # shard_map on a mesh, with the site's TP layout.
                params = jax.jit(quant_mod.quantize_decoder_params)(params)
                if (
                    _qkernel_backend()
                    and os.environ.get("LLMRANKERS_NO_INT8_KERNEL") != "1"
                ):
                    cfg = dataclasses.replace(cfg, int8_kernel=True)
            else:
                # T5 scoring is COMPUTE-bound: quantize weights AND route
                # matmul sites through the Pallas W8A8 int8-MXU kernel —
                # on a mesh, per-device under shard_map with the site's
                # TP layout (q/k/v/wi column-parallel, o/wo row-parallel
                # + psum; t5._mm dispatch). Sibling-site PACKING into
                # wide GEMM leaves (quant.T5_PACKS) stays single-chip:
                # a contiguous 'model' split of a packed leaf would mix
                # q/k/v at device boundaries, so meshes run per-site
                # kernels instead (qkv still fuses via the runtime
                # concat in t5._mm_fused).
                _1chip = mesh is None or mesh.devices.size == 1
                _kernel_on = (
                    _qkernel_backend()
                    and os.environ.get("LLMRANKERS_NO_INT8_KERNEL") != "1"
                )
                import functools as _ft

                params = jax.jit(
                    _ft.partial(quant_mod.quantize_t5_params,
                                pack=_kernel_on and _1chip)
                )(params)
                if _kernel_on:
                    cfg = dataclasses.replace(cfg, int8_kernel=True)
        if kv_quantize is not None:
            if kv_quantize not in ("int8", "int4"):
                raise ValueError(f"unknown kv_quantize mode {kv_quantize!r}")
            if kind != "decoder":
                raise ValueError("quantized KV cache targets decoder models")
            if kv_quantize == "int4" and cfg.head_dim_ % 2:
                raise ValueError("int4 KV cache needs an even head_dim")
            cfg = dataclasses.replace(cfg, kv_quant=kv_quantize)
            # Fused decode attention over the packed cache
            # (ops/kvq_attention.py) — OPT-IN, not default: measured
            # on-chip this round, the kernel wins standalone (int8
            # 1030 vs 1595us, int4 717 vs 841us at 3B decode shapes)
            # but LOSES inside the full jitted decode loop (0.54x /
            # 0.61x of the XLA path) — the (KV, B) grid's many small
            # programs can't amortize against XLA's fused dots. Kept
            # behind an env flag for re-evaluation on multi-chip or
            # future Mosaic versions; see docs/ARCHITECTURE.md.
            _1chip = mesh is None or mesh.devices.size == 1
            if (
                _1chip
                and jax.default_backend() == "tpu"
                and os.environ.get("LLMRANKERS_KVQ_KERNEL") == "1"
            ):
                cfg = dataclasses.replace(cfg, kvq_kernel=True)
        if spec_lookup and kind != "decoder":
            raise ValueError("spec_lookup targets decoder generation")
        self.spec_lookup = int(spec_lookup)
        # accept-rate observability: totals over this engine's lifetime
        self.spec_stats = {"tokens": 0, "rounds": 0}
        # continuous-batching observability: decode sessions that ran the
        # slot-refill path and how many refill batches they dispatched
        self.refill_stats = {
            "sessions": 0, "refills": 0, "prefix_kv_hits": 0,
        }
        # context-cap observability: rows whose real tokens were cut to
        # the model context over this engine's lifetime (the warn-once
        # stderr line is a courtesy; this counter is the record)
        self.truncated_rows = 0

        _mesh_size = 1 if mesh is None else mesh.devices.size
        # Flash policy, measured on v5e (see docs/ARCHITECTURE.md §4):
        # with native Dh=64 lane blocks and full-row q tiles the kernel
        # beats XLA's fused attention both standalone (H16: 4.6 vs
        # 7.6ms) and in-context (large encode: 240 vs 266ms; xl: 794 vs
        # 831ms), so 'auto' enables it for both model kinds on TPU.
        # Multi-device meshes run the kernel under shard_map (batch over
        # 'data', heads over 'model'). LLMRANKERS_NO_FLASH=1 opts out.
        _no = os.environ.get("LLMRANKERS_NO_FLASH") == "1"
        if use_flash == "on" or (
            use_flash == "auto"
            and jax.default_backend() == "tpu"
            and not _no
        ):
            cfg = dataclasses.replace(
                cfg, use_flash=True,
                flash_mesh=mesh if _mesh_size > 1 else None,
            )
        self.kind = kind
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh if mesh is not None else mesh_mod.single_device_mesh()
        # "auto"/"auto:K": serve on the default ladder while recording
        # true row lengths; after auto_plan_rows rows, swap in the
        # DP-optimal ladder (scoring results are padding-invariant, so
        # the swap only changes compile shapes and padded-token waste).
        self._auto_buckets = 0
        if isinstance(len_buckets, str):
            if len_buckets != "auto" and not len_buckets.startswith("auto:"):
                raise ValueError(f"len_buckets: unknown mode {len_buckets!r}")
            self._auto_buckets = (
                int(len_buckets.split(":", 1)[1]) if ":" in len_buckets
                else len(DEFAULT_LEN_BUCKETS)
            )
            if self._auto_buckets < 1:
                raise ValueError("len_buckets auto:K needs K >= 1")
            len_buckets = DEFAULT_LEN_BUCKETS
        self._auto_plan_rows = auto_plan_rows
        self._auto_lens: List[int] = []
        self.len_buckets = tuple(len_buckets)
        self.batch_buckets = tuple(batch_buckets)
        self.max_batch_tokens = max_batch_tokens
        # Prompt-prefix KV sharing (decoder models only; T5's bidirectional
        # encoder makes prefix reuse inexact, so it never applies there).
        self.prefix_share = (
            prefix_share
            and kind != "t5"
            and os.environ.get("LLMRANKERS_NO_PREFIX_SHARE") != "1"
        )
        self._jit_cache: Dict[Any, Any] = {}
        self._warned_ctx = False
        # Cross-wave prefix-KV cache: (adapter_key, prefix_tokens) ->
        # (ks [Ld, KV, len, Dh], vs, nbytes), LRU-evicted to the byte
        # budget. Entries are stored UNPADDED at their exact prefix
        # length (K/V at real positions is padding-invariant: absolute
        # RoPE + masked attention), so one entry serves waves whose
        # prefix area buckets differently. See _pkv_assemble.
        import collections as _collections
        import threading as _threading
        self._pkv: "_collections.OrderedDict[Any, Any]" = (
            _collections.OrderedDict()
        )
        self._pkv_bytes = 0
        self._pkv_budget = (
            int(prefix_cache_mb) * (1 << 20)
            if self.prefix_share and kind == "decoder"
            and os.environ.get("LLMRANKERS_NO_PKV_CACHE") != "1"
            else 0
        )
        self._pkv_lock = _threading.Lock()
        self.pkv_stats = {"hits": 0, "misses": 0, "evictions": 0}

        if kind == "t5":
            pspecs = mesh_mod.t5_param_pspecs(params)
        else:
            pspecs = mesh_mod.decoder_param_pspecs(params)
        self.params = mesh_mod.shard_params(params, pspecs, self.mesh)
        self._pspecs = pspecs
        self._data_sharding = mesh_mod.data_sharding(self.mesh)
        self._repl = NamedSharding(self.mesh, P())
        # Named LoRA adapters served from one engine (vLLM LoRARequest
        # parity, setwise.py:494-497): raw adapter pytrees registered via
        # add_adapter; merged params materialized on device lazily. A
        # merged copy is a FULL param pytree (6GB+ for a 3B bf16 model),
        # so at most ``max_cached_adapters`` stay resident — older ones
        # are evicted LRU and re-merged on next use (one einsum+add).
        import collections

        import threading

        self._adapters: Dict[str, Any] = {}
        self._adapter_params: "collections.OrderedDict[str, Any]" = (
            collections.OrderedDict()
        )
        # S-LoRA-style batched mixing: stacked (A, B) pytrees per adapter
        # name-set, shared by every row of a mixed dispatch (constant
        # memory in the number of adapters — no merged full-model copies).
        # LRU-bounded: distinct name-SETS can otherwise accumulate up to
        # 2^A stacks in a long-lived serve process (each ~N adapters'
        # A/B weights, device-resident). Eviction drops the reference
        # only — in-flight dispatches keep theirs alive, same discipline
        # as _adapter_params.
        self._mix_cache: "collections.OrderedDict[Tuple[str, ...], Any]" = (
            collections.OrderedDict()
        )
        self._max_mix_stacks = max(4, int(max_cached_adapters))
        self._adapter_lock = threading.Lock()
        self._adapter_merging: Dict[str, Any] = {}  # name -> threading.Event
        self._max_cached_adapters = max(1, int(max_cached_adapters))
        # Observability counters are mutated from cohort/server threads;
        # a dedicated lock keeps them exact (they never sit on the
        # device-dispatch path, so contention is negligible).
        self._stats_lock = threading.Lock()
        # RESOURCE_EXHAUSTED backoff memory: (kind, L, max_new) -> rows
        # per dispatch learned from an actual device OOM. _gen_row_limit
        # is an estimate; this is the session's measured truth, applied
        # on every later generate() call at the same shape family.
        self._learned_row_caps: Dict[Any, int] = {}

    # ------------------------------------------------------------------
    # Multi-adapter serving
    # ------------------------------------------------------------------
    def add_adapter(self, name: str, adapter, lcfg=None) -> None:
        """Register a LoRA adapter under ``name``.

        ``adapter`` is a PEFT checkpoint directory (adapter_config.json +
        adapter_model.safetensors) or an adapter pytree (then ``lcfg`` is
        required). Requests select it via the ``adapter=`` argument of
        score_labels/sequence_nll/generate; merged weights are cached per
        adapter so switching costs one einsum+add the first time only.
        """
        from ..models import quant as quant_mod
        from ..train import lora as lora_mod

        if quant_mod.is_quantized(self.params) or quant_mod.is_quantized_t5(
            self.params
        ):
            raise ValueError(
                "cannot apply LoRA adapters to quantized weights; "
                "merge the adapter first, then quantize"
            )
        if isinstance(adapter, str):
            adapter, lcfg = lora_mod.load_peft_adapter(adapter, self.params)
        elif lcfg is None:
            raise ValueError("lcfg required when passing an adapter pytree")
        self._adapters[name] = (adapter, lcfg)
        self._adapter_params.pop(name, None)
        import collections

        with self._adapter_lock:
            self._mix_cache = collections.OrderedDict(
                (k, v) for k, v in self._mix_cache.items() if name not in k
            )
        # Re-registering a name invalidates its cached prefix K/V too —
        # the merged weights (and thus the prefix forward) changed.
        with self._pkv_lock:
            stale = [k for k in self._pkv if k[0] == name]
            for k in stale:
                self._pkv_bytes -= self._pkv.pop(k)[2]

    def _params_for(self, adapter: Optional[str]):
        if adapter is None:
            return self.params
        # The engine is shared across cohort/server threads
        # (rerank_many_pipelined, the HTTP batching loop): the cache
        # mutation must be atomic, and eviction must NOT .delete()
        # buffers — another thread may hold the evicted pytree inside a
        # running dispatch. Dropping the reference lets JAX free the HBM
        # after the last pending use instead.
        #
        # The full-model merge jit is multi-second work: it runs OUTSIDE
        # the lock behind a per-adapter once-guard, so other adapters'
        # scoring threads never serialize behind a re-materialization;
        # concurrent requests for the SAME evicted adapter wait on its
        # event instead of merging twice.
        import threading

        while True:
            with self._adapter_lock:
                cached = self._adapter_params.get(adapter)
                if cached is not None:
                    self._adapter_params.move_to_end(adapter)
                    return cached
                ev = self._adapter_merging.get(adapter)
                if ev is None:
                    ev = threading.Event()
                    self._adapter_merging[adapter] = ev
                    break  # this thread owns the merge
            ev.wait()  # merge in flight elsewhere; re-check the cache
        try:
            from ..train import lora as lora_mod

            try:
                raw, lcfg = self._adapters[adapter]
            except KeyError:
                raise KeyError(
                    f"unknown adapter {adapter!r}; registered: "
                    f"{sorted(self._adapters)}"
                ) from None
            merged = jax.jit(functools.partial(lora_mod.merge, cfg=lcfg))(
                self.params, raw
            )
            sharded = mesh_mod.shard_params(merged, self._pspecs, self.mesh)
            with self._adapter_lock:
                while len(self._adapter_params) >= self._max_cached_adapters:
                    self._adapter_params.popitem(last=False)
                self._adapter_params[adapter] = sharded
            # Return the merged pytree directly: even if another thread's
            # insert immediately evicts it, this dispatch keeps its
            # reference alive (max_cached_adapters below the working set
            # degrades to a re-merge per flip, never to an error).
            return sharded
        finally:
            with self._adapter_lock:
                self._adapter_merging.pop(adapter, None)
            ev.set()

    # ------------------------------------------------------------------
    # S-LoRA-style batched multi-adapter mixing (VERDICT r3 #5)
    # ------------------------------------------------------------------
    def _mix_setup(
        self, row_adapters: Sequence[Optional[str]], n_rows: int
    ):
        """Validate a per-row adapter assignment and reduce it to either
        ``("single", name)`` (all rows share one adapter — the merged
        path is cheaper) or ``("mixed", names, idx)`` with idx[i] the
        1-based slot of row i's adapter in ``names`` (0 = base)."""
        from ..models import quant as quant_mod

        if len(row_adapters) != n_rows:
            raise ValueError(
                f"row_adapters has {len(row_adapters)} entries for "
                f"{n_rows} rows"
            )
        names = sorted({a for a in row_adapters if a is not None})
        if not names:
            return ("single", None)
        if len(names) == 1 and all(a is not None for a in row_adapters):
            return ("single", names[0])
        if self.kind != "decoder":
            raise ValueError(
                "batched multi-adapter mixing targets decoder models "
                "(reference LoRA serving is Rank-R1/vLLM, decoder-only; "
                "use adapter= for single-adapter T5 scoring)"
            )
        if quant_mod.is_quantized(self.params):
            raise ValueError(
                "cannot mix LoRA adapters over quantized weights; "
                "merge+quantize per adapter or serve in bf16"
            )
        slot = {n: i + 1 for i, n in enumerate(names)}
        idx = np.asarray(
            [0 if a is None else slot[a] for a in row_adapters], np.int32
        )
        return ("mixed", tuple(names), idx)

    def _resolve_adapters(
        self,
        adapter: Optional[str],
        row_adapters: Optional[Sequence[Optional[str]]],
        n_rows: int,
    ):
        """Shared entry-point reduction for score_labels/generate:
        returns ``(params, mix)`` where ``mix`` is None (single
        or base adapter — merged-weights path) or ``(names, idx)`` for
        batched per-row mixing. Enforces adapter=/row_adapters= mutual
        exclusion in ONE place so the two entry points can't diverge."""
        mix = None
        if row_adapters is not None:
            if adapter is not None:
                raise ValueError("pass adapter= or row_adapters=, not both")
            setup = self._mix_setup(row_adapters, n_rows)
            if setup[0] == "single":
                adapter = setup[1]
            else:
                mix = setup[1:]
        return self._params_for(adapter), mix

    def _stack_adapters(self, names: Tuple[str, ...]):
        """Stacked multi-adapter pytree for the qmm mixing seam
        (models/quant.py::_lora_mix): per target,
        a [L, N+1, in, rmax] and b [L, N+1, rmax, out] with slot 0 all
        zero (base rows) and each adapter's alpha/r pre-folded into b.
        Ranks are zero-padded to the set's max — the S-LoRA trick that
        lets heterogeneous adapters share one einsum. Cached per
        name-set; total memory is N * (the adapters themselves), not
        N * (a merged model copy)."""
        with self._adapter_lock:
            cached = self._mix_cache.get(names)
            if cached is not None:
                self._mix_cache.move_to_end(names)
        if cached is not None:
            return cached
        entries = []
        for n in names:
            try:
                entries.append(self._adapters[n])
            except KeyError:
                raise KeyError(
                    f"unknown adapter {n!r}; registered: "
                    f"{sorted(self._adapters)}"
                ) from None
        for ad, _ in entries:
            if "encoder" in ad or "decoder" in ad:
                raise ValueError(
                    "multi-adapter mixing supports decoder-layout "
                    "adapters (flat target dict)"
                )
        targets = sorted(set().union(*[set(ad) for ad, _ in entries]))
        rmax = max(
            ad[t]["a"].shape[-1]
            for ad, _ in entries for t in ad
        )
        dtype = self.params["layers"]["wq"].dtype
        stacked: Dict[str, Any] = {}
        for t in targets:
            a_col, b_col = [], []
            for ad, lc in entries:
                ab = ad.get(t)
                if ab is None:
                    L_, d_in, d_out = self.params["layers"][t].shape
                    a = jnp.zeros((L_, d_in, rmax), dtype)
                    b = jnp.zeros((L_, rmax, d_out), dtype)
                else:
                    a = ab["a"].astype(dtype)
                    b = (ab["b"].astype(jnp.float32) * lc.scale).astype(dtype)
                    r = a.shape[-1]
                    if r < rmax:
                        a = jnp.pad(a, ((0, 0), (0, 0), (0, rmax - r)))
                        b = jnp.pad(b, ((0, 0), (0, rmax - r), (0, 0)))
                a_col.append(a)
                b_col.append(b)
            zero_a = jnp.zeros_like(a_col[0])
            zero_b = jnp.zeros_like(b_col[0])
            stacked[t] = {
                "a": jnp.stack([zero_a] + a_col, axis=1),
                "b": jnp.stack([zero_b] + b_col, axis=1),
            }
        stacked = jax.device_put(stacked, self._repl)
        with self._adapter_lock:
            while len(self._mix_cache) >= self._max_mix_stacks:
                self._mix_cache.popitem(last=False)
            self._mix_cache[names] = stacked
        return stacked

    def _aug_params(self, names: Tuple[str, ...], idx: np.ndarray):
        """Base params + the adapter stack + a per-row index vector,
        riding as extra stacked per-layer leaves so every layer scan
        (prefill, decode, spec verify, refill) carries them with no
        code changes at the sites (quant.qmm applies the mix)."""
        from ..models import quant as quant_mod

        stacked = self._stack_adapters(names)
        L = self.cfg.num_hidden_layers
        idx_l = jnp.broadcast_to(
            jnp.asarray(idx, jnp.int32)[None, :], (L, len(idx))
        )
        layers = dict(self.params["layers"])
        layers[quant_mod.LORA_KEY] = stacked
        layers[quant_mod.LORA_IDX] = idx_l
        out = dict(self.params)
        out["layers"] = layers
        return out

    def _pad_idx(self, idx: np.ndarray, B: int) -> np.ndarray:
        out = np.zeros((B,), np.int32)
        out[: len(idx)] = idx
        return out

    # ------------------------------------------------------------------
    # Host-side padding/bucketing
    # ------------------------------------------------------------------
    def _record_lengths(self, rows: List[List[int]]) -> None:
        """auto len_buckets: accumulate true row lengths; once
        auto_plan_rows have been seen, swap in the DP-optimal ladder
        (utils/bucketplan.py). One-shot — the planned ladder then serves
        the rest of the run. Thread-safe under the stats lock; batches
        already in flight keep their old shapes (padding-invariant)."""
        from ..utils.bucketplan import ladder_waste, optimal_buckets

        with self._stats_lock:
            if not self._auto_buckets:  # planned while we waited
                return
            self._auto_lens.extend(len(r) for r in rows)
            if len(self._auto_lens) < self._auto_plan_rows:
                return
            lens = self._auto_lens
            k = self._auto_buckets
            self._auto_buckets = 0  # plan exactly once
            self._auto_lens = []
        planned = optimal_buckets(lens, max_buckets=k)
        cap = self._ctx_cap()
        if cap:
            planned = tuple(min(b, cap) for b in planned)
            planned = tuple(dict.fromkeys(planned))  # dedupe, keep order
        before = ladder_waste(lens, self.len_buckets)
        after = ladder_waste(lens, planned)
        logger.info(
            "len_buckets auto: planned %s from %d rows "
            "(padded-token waste %d -> %d, %.1f%%)",
            planned, len(lens), before, after,
            100.0 * (1 - after / before) if before else 0.0,
        )
        self.len_buckets = planned

    def _pad_batch(
        self, rows: List[List[int]], left: bool = False,
        b_cap: Optional[int] = None, l_force: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, int, int]:
        """Pad token rows into a (batch, length) bucket. Right padding for
        encoder prompts; left padding for decoder-only batch generation
        (pairwise.py:71). ``b_cap`` bounds the batch bucket (memory-limited
        callers — the padded batch must not exceed what the caller's HBM
        estimate allows). ``l_force`` pins the padded length exactly
        (refill sessions: every batch must match the session cache
        layout). Scatter runs in native code when available."""
        from ..utils import native

        n = len(rows)
        max_len = max((len(r) for r in rows), default=1)
        if self._auto_buckets:
            self._record_lengths(rows)
        if l_force is not None:
            L = l_force
        else:
            L = self._cap_len(_bucket(max_len, self.len_buckets), max_len)
        if L < max_len:  # context cap hit: count every truncated row
            cut = sum(1 for r in rows if len(r) > L)
            with self._stats_lock:
                self.truncated_rows += cut
        B = _bucket(n, self.batch_buckets)
        if b_cap is not None and B > b_cap:
            # Memory-capped dispatch: pad only to the row count the
            # caller chose (already a _chunks ladder rung), NEVER up to
            # the cap. Padding 96 chunk rows up to a 110-row cap both
            # compiled an off-ladder shape and re-created the allocation
            # the cap exists to prevent (the round-3 bench OOM:
            # bf16[24,110,16,640,64] cross-K/V, BENCH_r03.json tail).
            B = n
        # device_put with P('data') needs B divisible by the data axis;
        # the b_cap path can otherwise produce arbitrary sizes (e.g. a
        # 7-row memory-capped generate chunk on a dp=2 mesh).
        dp = mesh_mod.batch_divisor(self.mesh)
        B = -(-B // dp) * dp
        ids, mask = native.pack_padded(rows, B, L, self.tokenizer.pad_id, left)
        return ids, mask, n, B

    def _pad_batch_left(self, rows: List[List[int]], b_cap: Optional[int] = None,
                        l_force: Optional[int] = None):
        return self._pad_batch(rows, left=True, b_cap=b_cap, l_force=l_force)

    def _ctx_cap(self) -> int:
        """Hard context cap: decoder RoPE positions past
        max_position_embeddings are outside the trained range. T5 rel-pos
        buckets saturate gracefully — no cap (returns 0)."""
        if self.kind != "decoder":
            return 0
        return int(getattr(self.cfg, "max_position_embeddings", 0) or 0)

    def _cap_len(self, L: int, max_len: int) -> int:
        """Apply the context cap to a padded length, warning once when it
        truncates real tokens (tail kept for left padding, head for right
        — pack_padded's convention)."""
        cap = self._ctx_cap()
        if cap and L > cap:
            if max_len > cap and not self._warned_ctx:
                self._warned_ctx = True
                print(
                    f"warning: truncating rows of {max_len} tokens to "
                    f"the model context ({cap})", file=sys.stderr,
                )
            L = cap
        return L

    def _group(self, chunk: List[List[int]], b_cap: Optional[int] = None,
               l_total: Optional[int] = None, want_host: bool = False):
        """Shared-prefix grouping of a chunk (decoder kind only).

        Returns (n, device args (pids, pmask, gidx, sids, smask)) when
        sharing pays off, else None. Rows keep their original order —
        only the prefix compute is deduplicated. ``l_total`` pins
        prefix-bucket + suffix length to exactly that many positions
        (refill sessions: the assembled cache must match the session
        prompt area); when the split can't fit, returns None and the
        caller uses the plain layout. ``want_host`` appends the host-side
        grouping ``(prefix token lists, padded prefix len, suffix area)``
        — refill sessions keep it to match later pending rows against the
        session's cached prefix K/V."""
        if not self.prefix_share:
            return None
        from . import prefix as prefix_mod

        grp = prefix_mod.group_shared_prefixes(chunk)
        if grp is None:
            return None
        pre_rows, gidx, suf_rows = grp
        # Prefix and suffix are padded separately, so the plain path's
        # context cap can't see the combined length — rows that would
        # exceed it must take the ungrouped path, which truncates them
        # (with the warning) instead of running out-of-range RoPE.
        cap = self._ctx_cap()
        if cap and any(
            len(pre_rows[g]) + len(s) > cap for g, s in zip(gidx, suf_rows)
        ):
            return None
        l_pre = l_suf = None
        if l_total is not None:
            pre_max = max((len(p) for p in pre_rows), default=0)
            suf_max = max(len(s) for s in suf_rows)
            # Prefer a ladder rung for the prefix (fewer compiles); fall
            # back to the exact prefix max when the rung steals too much
            # of the fixed total from the suffix.
            l_pre = _bucket(max(pre_max, 1), self.len_buckets)
            if l_pre + suf_max > l_total:
                l_pre = max(pre_max, 1)
            l_suf = l_total - l_pre
            if l_suf < suf_max or l_suf < 1:
                return None
        # Cap the prefix batch at the true group count: bucketing 1-3
        # unique prefixes up to the 8-row batch bucket multiplies the
        # prefix prefill (the longest sequences in the dispatch) by the
        # pad factor — measured 8x wasted prefix compute at G=1.
        pids, pmask, _, _ = self._pad_batch(
            pre_rows, b_cap=len(pre_rows), l_force=l_pre
        )
        sids, smask, n, B = self._pad_batch(
            suf_rows, b_cap=b_cap, l_force=l_suf
        )
        gvec = np.zeros((B,), np.int32)
        gvec[: len(gidx)] = gidx
        sids_d, smask_d = self._put(sids, smask)
        args = (
            jnp.asarray(pids), jnp.asarray(pmask),
            jax.device_put(jnp.asarray(gvec), self._data_sharding),
            sids_d, smask_d,
        )
        if want_host:
            # (unique prefix token lists, padded pids, prefix area,
            #  suffix area) — _rr_prep_pre matches refill rows against
            # these to reuse the session's cached prefix K/V.
            return n, args, (
                pre_rows, pids, int(pids.shape[1]), int(sids.shape[1])
            )
        return n, args

    def _pkv_assemble(self, pp, akey, host):
        """Cross-wave prefix-KV cache lookup + fill for one wave.

        Returns ``(ks, vs)`` shaped [Ld, G, KV, Lp, Dh] covering the
        wave's unique prefixes — cached entries padded to the wave's
        prefix area, missing ones computed in ONE ``prefix_kv`` dispatch
        and inserted (LRU, byte budget) — or None when the cache is
        disabled. A sort's successive waves re-score the same query
        heads (heapsort rounds, bubblesort passes, num_permutation
        copies): within-wave grouping (_group) dedups the prefix forward
        per dispatch, this cache dedups it across dispatches — vLLM's
        cross-request prefix-block reuse (reference setwise.py:450-454).

        ``akey`` keys the adapter identity (None = base weights): merged
        weights change the prefix forward, so each adapter caches its
        own K/V; add_adapter() purges a re-registered name. Mixed
        per-row-adapter dispatches never reach here (grouping is skipped
        for them)."""
        if self._pkv_budget <= 0:
            return None
        pre_rows, _pids, Lp, _Ls = host
        keys = [(akey, tuple(p)) for p in pre_rows]
        got: Dict[int, Any] = {}
        misses: List[int] = []
        with self._pkv_lock:
            for g, key in enumerate(keys):
                e = self._pkv.get(key)
                if e is None:
                    misses.append(g)
                else:
                    self._pkv.move_to_end(key)
                    got[g] = (e[0], e[1])
            self.pkv_stats["hits"] += len(got)
            self.pkv_stats["misses"] += len(misses)
        if misses:
            mpre = [pre_rows[g] for g in misses]
            mids, mmask, _, _ = self._pad_batch(
                mpre, b_cap=len(mpre), l_force=Lp
            )
            fn = self._get_jit("prefix_kv")
            ks_m, vs_m = fn(pp, jnp.asarray(mids), jnp.asarray(mmask))
            with self._pkv_lock:
                for j, g in enumerate(misses):
                    # Store sliced to the true length (>=1 so empty
                    # singleton-group prefixes stay indexable; their
                    # pmask row is all-false, so the value is never
                    # attended).
                    Lr = max(1, len(pre_rows[g]))
                    ek = ks_m[:, j, :, :Lr, :]
                    ev = vs_m[:, j, :, :Lr, :]
                    got[g] = (ek, ev)
                    nbytes = int(ek.size) * ek.dtype.itemsize * 2
                    old = self._pkv.pop(keys[g], None)
                    if old is not None:
                        self._pkv_bytes -= old[2]
                    self._pkv[keys[g]] = (ek, ev, nbytes)
                    self._pkv_bytes += nbytes
                while self._pkv_bytes > self._pkv_budget and self._pkv:
                    _, (_, _, eb) = self._pkv.popitem(last=False)
                    self._pkv_bytes -= eb
                    self.pkv_stats["evictions"] += 1
        ks_list, vs_list = [], []
        for g in range(len(pre_rows)):
            ek, ev = got[g]
            pad = Lp - ek.shape[2]
            if pad:
                pw = ((0, 0), (0, 0), (0, pad), (0, 0))
                ek, ev = jnp.pad(ek, pw), jnp.pad(ev, pw)
            ks_list.append(ek)
            vs_list.append(ev)
        return jnp.stack(ks_list, axis=1), jnp.stack(vs_list, axis=1)

    def _pkv_insert(self, akey, pre_rows, ks, vs):
        """Seed the cross-wave prefix cache from K/V a dispatch already
        computed (refill-session start: rr_prefill_shared returns it
        anyway), so later waves of the same sort hit without ever paying
        a standalone prefix_kv dispatch."""
        if self._pkv_budget <= 0:
            return
        with self._pkv_lock:
            for g, p in enumerate(pre_rows):
                key = (akey, tuple(p))
                if key in self._pkv:
                    self._pkv.move_to_end(key)
                    continue
                Lr = max(1, len(p))
                ek = ks[:, g, :, :Lr, :]
                ev = vs[:, g, :, :Lr, :]
                nbytes = int(ek.size) * ek.dtype.itemsize * 2
                self._pkv[key] = (ek, ev, nbytes)
                self._pkv_bytes += nbytes
            while self._pkv_bytes > self._pkv_budget and self._pkv:
                _, (_, _, eb) = self._pkv.popitem(last=False)
                self._pkv_bytes -= eb
                self.pkv_stats["evictions"] += 1

    def _chunks(self, rows: List[List[int]], row_limit: Optional[int] = None):
        """Split an oversized wave so B*L stays under max_batch_tokens
        (and under ``row_limit`` when the caller has a per-row memory
        estimate, e.g. the T5 generate path's cross-K/V cache)."""
        if not rows:
            return
        max_len = max(len(r) for r in rows)
        L = self._cap_len(_bucket(max_len, self.len_buckets), 0)
        per = max(1, self.max_batch_tokens // L)
        if row_limit is not None:
            per = max(1, min(per, row_limit))
        # Round down to a ladder rung; when the (memory) limit sits below
        # the smallest rung, KEEP the raw limit — rounding up would
        # re-create the allocation the limit exists to prevent (the
        # caller's _pad_batch(b_cap=...) then pads to the chunk size).
        # Which ladder depends on the caller:
        #  - memory-capped generate chunks (row_limit set) use the
        #    DENSIFIED ladder: row limits land between bucket rungs
        #    (e.g. a Qwen2.5-3B 1.8k-prompt budget yields ~26 rows), and
        #    rounding 26 down to the 8 bucket was measured to cost 3x
        #    decode throughput — each dispatch re-streams the full
        #    weight set, so rows-per-dispatch IS the decode throughput.
        #    These chunks dispatch with b_cap, so an off-bucket rung
        #    never pads up.
        #  - token-budget scoring chunks (row_limit None) must land ON a
        #    batch bucket: _pad_batch rounds the chunk's row count UP to
        #    a bucket rung, so a densified rung that is not itself a
        #    bucket pads every full chunk (192 -> 256 with a
        #    (16,32,64,256) ladder = 25% systematic row-fill waste on
        #    every wave above the budget; measured 0.77 fill on the xl
        #    bench shape).
        ladder = (self._row_ladder() if row_limit is not None
                  else self.batch_buckets)
        fitting = [b for b in ladder if b <= per]
        if fitting:
            per = max(fitting)
        for i in range(0, len(rows), per):
            yield i, rows[i : i + per]

    def _row_ladder(self) -> List[int]:
        """Rows-per-dispatch rungs for memory-capped generate chunks:
        the batch buckets densified with mid rungs (see _chunks)."""
        return sorted(set(self.batch_buckets) | {12, 16, 24, 48, 96, 192, 384})

    def _halve_cap(self, n: int) -> int:
        """Backed-off rows-per-dispatch after an OOM at ``n`` rows: the
        largest ladder rung <= n//2 (so the retry shape is one the
        ladder would choose anyway), floor 1."""
        half = max(1, n // 2)
        fitting = [b for b in self._row_ladder() if b <= half]
        return max(fitting) if fitting else half

    def _gen_row_limit(self, rows: List[List[int]], max_new: int) -> int:
        """Rows per dispatch so the generation program's KV caches fit HBM.

        T5 (t5_greedy_generate) materializes per-layer cross-attention K/V
        ([Ld, B, H, L, Dh] x2) plus the self-attention cache — flan-t5-xl
        is ~126MB/row at L=640. Decoder models carry per-layer self K/V of
        length L + max_new — Qwen2.5-3B at a 1.8k prompt + 2k budget is
        ~280MB/row. Either way the cache, not the token budget, is the
        binding constraint on big models."""
        cfg = self.cfg
        L = self._cap_len(_bucket(max(len(r) for r in rows), self.len_buckets), 0)
        bpe = jnp.dtype(jnp.bfloat16).itemsize
        if self.kind == "t5":
            # Cross K/V ([Ld,B,H,L,Dh] x2) dominates; the build peak holds
            # one extra tensor's worth while the second einsum's result
            # coexists with the first (generate.t5_greedy_generate emits
            # the target layout straight from the dot, so there is no
            # further transpose copy). This is an ESTIMATE — generate()'s
            # RESOURCE_EXHAUSTED backoff is the hard guarantee; a learned
            # cap from a real OOM overrides this number for the session.
            cross = cfg.num_decoder_layers * cfg.num_heads * cfg.d_kv * L * bpe
            per_row = (
                cross * 3  # ck + cv + build peak
                + cfg.num_decoder_layers * cfg.num_heads * cfg.d_kv
                * (max_new + 2) * 2 * bpe          # self K/V (prefix+gen)
                + 6 * L * max(cfg.d_ff, cfg.d_model) * bpe  # enc transients
            )
        else:
            # int8 KV halves the cache bytes (plus one fp32 scale, 4/Dh);
            # int4 packs two dims per byte (plus two fp32 scales, 8/Dh).
            if cfg.kv_quant == "int4":
                kv_bpe = 0.5 + 8.0 / cfg.head_dim_
            elif cfg.kv_quant:
                kv_bpe = 1 + 4.0 / cfg.head_dim_
            else:
                kv_bpe = bpe
            # Prefill transient live set per row: [L, d_ff] FFN
            # intermediates (one fewer when the fused gated kernel keeps
            # the gate/up pair in VMEM) + ~10 [L, D] streams
            # (h/hn/q/attn-out and XLA double-buffering; K/V stay at KV
            # heads — the GQA-native flash kernel never materializes the
            # H-repeated copy that used to dominate). Calibrated on v5e:
            # Qwen2.5-3B int8 at L=1856 fits 32 rows and OOMs at 40; this
            # formula yields 38 there.
            ffn_live = 2 if cfg.qkernels else 3
            F = max(cfg.intermediate_size, cfg.hidden_size)
            per_row = (
                cfg.num_hidden_layers * cfg.num_key_value_heads
                * cfg.head_dim_ * (L + max_new) * 2 * kv_bpe  # self K/V
                + (ffn_live * F + 10 * cfg.hidden_size) * L * bpe
            )
        try:
            limit = jax.devices()[0].memory_stats()["bytes_limit"]
        except Exception:
            limit = 16 * 1024**3
        params_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree.leaves(self.params)
        )
        free = max(limit - params_bytes - 2 * 1024**3, 1024**3) * 0.7
        return max(1, int(free // per_row))

    def _put(self, ids: np.ndarray, mask: np.ndarray):
        ids = jax.device_put(jnp.asarray(ids), self._data_sharding)
        mask = jax.device_put(jnp.asarray(mask), self._data_sharding)
        return ids, mask

    # ------------------------------------------------------------------
    # score_labels: one forward, label-token logits
    # ------------------------------------------------------------------
    def score_labels(
        self,
        prompt_rows: List[List[int]],
        label_ids: Sequence[int],
        decoder_prefix: Sequence[int] = (),
        stats: Optional[BatchStats] = None,
        adapter: Optional[str] = None,
        row_adapters: Optional[Sequence[Optional[str]]] = None,
    ) -> np.ndarray:
        """[N, K] fp32 logits of each label token at the first free
        decoder position (T5: after the forced prefix, setwise.py:179-188;
        decoder-only: after the prompt's last real token).

        ``row_adapters`` assigns a (registered) LoRA adapter PER ROW —
        one dispatch serves N adapters via batched A·B mixing at constant
        memory (vLLM multi-LoRA parity, setwise.py:491-498). Mutually
        exclusive with ``adapter``; shared-prefix grouping is skipped for
        mixed dispatches (prefix K/V would depend on the adapter)."""
        pp, mix = self._resolve_adapters(
            adapter, row_adapters, len(prompt_rows)
        )
        out = np.zeros((len(prompt_rows), len(label_ids)), np.float32)
        labels = tuple(int(x) for x in label_ids)
        prefix = tuple(int(x) for x in decoder_prefix)
        if self.kind == "t5" and not prefix:
            # T5 scoring reads logits after the forced prefix; an empty
            # prefix means "first decoder position" = just the start token.
            prefix = (int(self.cfg.decoder_start_token_id),)
        # Two phases: submit every chunk first (JAX dispatch is async, so
        # host padding of chunk i+1 overlaps device compute of chunk i),
        # then fetch.
        pending = []
        for off, chunk in self._chunks(prompt_rows):
            if stats is not None:
                stats.prompt_tokens += sum(len(r) for r in chunk) + len(prefix) * len(chunk)
            if self.kind == "t5":
                ids, mask, n, B = self._pad_batch(chunk)
                fn = self._get_jit("t5_labels", ids.shape, labels, prefix)
                pending.append((off, n, fn(pp, *self._put(ids, mask))))
                continue
            grp = None if mix else self._group(chunk, want_host=True)
            if grp is not None:
                n, args, host = grp
                pre = self._pkv_assemble(pp, adapter, host)
                if pre is not None:
                    fn = self._get_jit(
                        "dec_labels_pre",
                        (pre[0].shape, args[3].shape), labels,
                    )
                    pending.append((off, n, fn(
                        pp, pre[0], pre[1], args[1], args[2], args[3],
                        args[4],
                    )))
                    continue
                fn = self._get_jit(
                    "dec_labels_shared", (args[0].shape, args[3].shape), labels
                )
                pending.append((off, n, fn(pp, *args)))
            else:
                ids, mask, n, B = self._pad_batch_left(chunk)
                fn = self._get_jit("dec_labels", ids.shape, labels, prefix)
                pc = pp
                if mix:
                    names, idx = mix
                    pc = self._aug_params(
                        names, self._pad_idx(idx[off : off + n], B)
                    )
                pending.append((off, n, fn(pc, *self._put(ids, mask))))
        for off, n, res in pending:
            out[off : off + n] = np.asarray(res)[:n]
        return out

    # ------------------------------------------------------------------
    # sequence_nll: teacher-forced decoder CE (qlm)
    # ------------------------------------------------------------------
    def sequence_nll(
        self,
        prompt_rows: List[List[int]],
        target_rows: List[List[int]],
        stats: Optional[BatchStats] = None,
        adapter: Optional[str] = None,
    ) -> np.ndarray:
        """[N] fp32 = sum over target positions of CE(logits, target).

        Matches the reference qlm scoring (pointwise.py:73-79): targets
        include the leading pad token; decoder inputs are the right-shifted
        targets; no position is ignored.
        """
        assert self.kind == "t5", "qlm scoring is a T5 path (pointwise.py:19-26)"
        pp = self._params_for(adapter)
        out = np.zeros((len(prompt_rows),), np.float32)
        idx = list(range(len(prompt_rows)))
        for off, chunk in self._chunks(prompt_rows):
            tchunk = target_rows[off : off + len(chunk)]
            ids, mask, n, B = self._pad_batch(chunk)
            t_max = max(len(t) for t in tchunk)
            T = _bucket(t_max, self.len_buckets)
            tgt = np.zeros((B, T), np.int32)
            tw = np.zeros((B, T), np.float32)
            for i, t in enumerate(tchunk):
                t = t[:T]
                tgt[i, : len(t)] = t
                tw[i, : len(t)] = 1.0
            if stats is not None:
                stats.prompt_tokens += sum(len(r) for r in chunk) + sum(
                    len(t) for t in tchunk
                )
            fn = self._get_jit("t5_nll", (ids.shape, tgt.shape))
            ids_d, mask_d = self._put(ids, mask)
            res = fn(pp, ids_d, mask_d, jnp.asarray(tgt), jnp.asarray(tw))
            out[off : off + n] = np.asarray(res)[:n]
        return out

    # ------------------------------------------------------------------
    # generate: greedy decode
    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_rows: List[List[int]],
        max_new_tokens: int,
        decoder_prefix: Sequence[int] = (),
        stop_strings: Sequence[str] = (),
        chunk_tokens: Optional[int] = None,
        stats: Optional[BatchStats] = None,
        adapter: Optional[str] = None,
        row_adapters: Optional[Sequence[Optional[str]]] = None,
        temperature: float = 0.0,
        seed: Optional[int] = None,
    ) -> Tuple[List[str], List[int]]:
        """Greedy generation; returns (decoded completions, per-row new
        token counts up to and including EOS).

        ``temperature > 0`` samples each token categorically from
        logits/temperature instead of argmax (vLLM SamplingParams
        equivalent; decoder models only, incompatible with spec_lookup
        whose acceptance rule is greedy). ``seed`` fixes the sample
        stream: the same (rows, temperature, seed, chunking) call is
        reproducible; different dispatch partitioning (row_limit, refill
        engagement) legitimately re-keys the stream.

        ``stop_strings`` truncate the decoded host-side text; long
        decoder-only generations run in chunks of ``chunk_tokens`` with a
        host stop-string check between chunks, so a 2048-token Rank-R1
        budget stops as soon as every row has emitted "</answer>"
        (SURVEY.md §7 hard part #3).

        ``row_adapters`` assigns a registered LoRA adapter per row: one
        dispatch serves N adapters via batched A·B mixing at constant
        memory (vLLM multi-LoRA parity, setwise.py:491-498). Mutually
        exclusive with ``adapter``; shared-prefix grouping is skipped
        for mixed dispatches (the prefix K/V would depend on the
        adapter)."""
        pp, mix = self._resolve_adapters(
            adapter, row_adapters, len(prompt_rows)
        )
        sampling = None
        if temperature and temperature > 0.0:
            if self.kind != "decoder":
                raise ValueError(
                    "temperature sampling targets decoder generation "
                    "(T5 generate serves 2-token label scoring — greedy)"
                )
            if self.spec_lookup:
                raise ValueError(
                    "temperature sampling is incompatible with "
                    "spec_lookup (speculative acceptance is greedy)"
                )
            sampling = (
                float(temperature),
                jax.random.PRNGKey(0 if seed is None else int(seed)),
            )
        results: List[str] = [""] * len(prompt_rows)
        ntokens: List[int] = [0] * len(prompt_rows)
        prefix = tuple(int(x) for x in decoder_prefix)
        if self.kind == "t5" and not prefix:
            # T5 decoding always starts from the start token; a zero-width
            # prefix array would be unindexable inside the decode scan.
            prefix = (int(self.cfg.decoder_start_token_id),)
        if chunk_tokens is None and max_new_tokens >= 512 and self.kind != "t5":
            chunk_tokens = 256
        if sampling is not None and chunk_tokens is None:
            # Sampling rides the chunked decode loop (the only paths
            # carrying an rng); one full-budget chunk when unchunked.
            chunk_tokens = max_new_tokens
        if not prompt_rows:
            return results, ntokens
        row_limit = self._gen_row_limit(prompt_rows, max_new_tokens)
        # Apply (and on OOM, update) the session's learned cap for this
        # shape family: _gen_row_limit is an estimate; a real
        # RESOURCE_EXHAUSTED is ground truth (VERDICT r3 weak #1 — one
        # optimistic estimate must never again be a dead run).
        L_key = self._cap_len(
            _bucket(max(len(r) for r in prompt_rows), self.len_buckets), 0
        )
        cap_key = ("gen", self.kind, L_key, max_new_tokens)
        with self._stats_lock:
            learned = self._learned_row_caps.get(cap_key)
        if learned is not None:
            row_limit = min(row_limit, learned)
        def emit(off: int, chunk: List[List[int]], toks: np.ndarray) -> None:
            # Token accounting only after a successful dispatch, so an
            # OOM retry never double-counts the chunk.
            if stats is not None:
                stats.prompt_tokens += sum(len(r) for r in chunk) + len(prefix) * len(chunk)
            # The device fills frozen rows with cfg.pad_token_id (which can
            # differ from the tokenizer's pad, e.g. Qwen2); strip both.
            pad_ids = {self.tokenizer.pad_id, int(self.cfg.pad_token_id)}
            for i, row in enumerate(toks):
                row_l = row.tolist()
                # Count up to and including EOS (reference counts the
                # emitted ids, setwise.py:97). Rows frozen early (EOS or a
                # stop string in the chunked path) trail with pad filler,
                # which must not count toward the completion meter.
                try:
                    ntok = row_l.index(self.tokenizer.eos_id) + 1
                except ValueError:
                    ntok = len(row_l)
                    while ntok > 0 and row_l[ntok - 1] in pad_ids:
                        ntok -= 1
                ntokens[off + i] = ntok
                if stats is not None:
                    stats.completion_tokens += ntok
                # Decode only the counted completion: tokens past EOS are
                # junk the device may emit when the tokenizer's EOS is not
                # the model config's (it keeps decoding until ITS eos or a
                # host stop-check, whose granularity varies by path).
                text = self.tokenizer.decode(
                    row_l[:ntok], skip_special_tokens=True
                )
                for s in stop_strings:
                    cut = text.find(s)
                    if cut != -1:
                        text = text[: cut + len(s)]
                results[off + i] = text

        queue: List[Tuple[int, List[List[int]]]] = list(
            self._chunks(prompt_rows, row_limit)
        )
        # Slot refill (continuous batching): a multi-dispatch long-decode
        # wave runs as ONE fixed-shape decode session — finished rows'
        # cache slots are re-prefilled from pending rows at chunk
        # boundaries instead of sitting as frozen pad filler until the
        # dispatch drains (vLLM's core serving loop, the backend of
        # reference setwise.py:450-454; VERDICT r3 missing #2).
        import os as _os

        use_rr = (
            self.kind == "decoder"
            and len(queue) > 1
            and bool(chunk_tokens)
            and chunk_tokens < max_new_tokens
            and _os.environ.get("LLMRANKERS_NO_REFILL") != "1"
        )
        if use_rr:
            while True:
                try:
                    toks_all = self._generate_refill(
                        pp, prompt_rows, max_new_tokens, stop_strings,
                        chunk_tokens, row_limit, mix=mix,
                        sampling=sampling,
                        pkv_key=adapter if mix is None else _NO_PKV,
                    )
                    break
                except Exception as e:
                    if row_limit <= 1 or not _is_oom(e):
                        raise
                    row_limit = self._halve_cap(row_limit)
                    with self._stats_lock:
                        self._learned_row_caps[cap_key] = row_limit
                    logger.warning(
                        "device OOM in refill session (kind=%s L=%d "
                        "max_new=%d); backing off to %d rows/dispatch",
                        self.kind, L_key, max_new_tokens, row_limit,
                    )
            emit(0, prompt_rows, toks_all)
            return results, ntokens
        while queue:
            off, chunk = queue.pop(0)
            try:
                toks = self._generate_dispatch(
                    pp, chunk, max_new_tokens, prefix, stop_strings,
                    chunk_tokens, row_limit,
                    mix_chunk=(
                        (mix[0], mix[1][off : off + len(chunk)])
                        if mix else None
                    ),
                    # Distinct sample stream per dispatch chunk (keyed by
                    # its row offset in the wave).
                    sampling=(
                        (sampling[0], jax.random.fold_in(sampling[1], off))
                        if sampling else None
                    ),
                    pkv_key=adapter if mix is None else _NO_PKV,
                )
            except Exception as e:  # catch-halve-retry on device OOM
                if len(chunk) == 1 or not _is_oom(e):
                    raise
                row_limit = self._halve_cap(len(chunk))
                with self._stats_lock:
                    self._learned_row_caps[cap_key] = row_limit
                logger.warning(
                    "device OOM at %d generate rows (kind=%s L=%d "
                    "max_new=%d); backing off to %d rows/dispatch",
                    len(chunk), self.kind, L_key, max_new_tokens, row_limit,
                )
                queue = [
                    (off + i, sub) for i, sub in self._chunks(chunk, row_limit)
                ] + queue
                continue
            emit(off, chunk, toks)
        return results, ntokens

    def _generate_dispatch(
        self,
        pp,
        chunk: List[List[int]],
        max_new_tokens: int,
        prefix: Tuple[int, ...],
        stop_strings: Sequence[str],
        chunk_tokens: Optional[int],
        row_limit: Optional[int],
        mix_chunk=None,  # (names, idx np [len(chunk)]) multi-adapter rows
        sampling=None,  # (temperature, rng) — forces the chunked route
        pkv_key=_NO_PKV,  # adapter key for the cross-wave prefix cache
    ) -> np.ndarray:
        """One generate dispatch over ``chunk`` rows; returns the emitted
        token matrix [n, max_new_tokens]. Everything that can hit a
        device RESOURCE_EXHAUSTED lives here (prefill + decode + fetch),
        so generate()'s backoff loop can retry the whole chunk smaller."""
        chunked = (
            bool(chunk_tokens) and chunk_tokens < max_new_tokens
        ) or sampling is not None
        spec = self.spec_lookup > 0 and self.kind == "decoder"
        # Speculation pads the cache so a budget-crossing verify block
        # (and the harmless frozen-row block writes after it) stay in
        # bounds (generate.decoder_spec_decode_chunk docstring).
        mn_pad = (
            max_new_tokens + 2 * (self.spec_lookup + 1)
            if spec else max_new_tokens
        )
        grp = (
            None if (self.kind == "t5" or mix_chunk)
            else self._group(chunk, row_limit, want_host=True)
        )
        if self.kind == "t5":
            ids, mask, n, B = self._pad_batch(chunk, b_cap=row_limit)
            fn = self._get_jit("t5_gen", ids.shape, prefix, max_new_tokens)
            return np.asarray(fn(pp, *self._put(ids, mask)))[:n]
        if grp is not None:
            n, args, host = grp
            B = args[3].shape[0]
            prompt_len = args[0].shape[1] + args[3].shape[1]
            # Cross-wave prefix cache: when enabled, swap the in-jit
            # prefix forward for cache-assembled K/V inputs — the
            # *_pre jit family mirrors *_shared argument-for-argument
            # past the swapped prefix operands.
            pre = (
                self._pkv_assemble(pp, pkv_key, host)
                if pkv_key is not _NO_PKV else None
            )
            if pre is not None:
                shapes = (pre[0].shape, args[3].shape)
                jargs = (pre[0], pre[1], args[1], args[2], args[3], args[4])
                nm_prefill, nm_gen = "dec_prefill_pre", "dec_gen_pre"
            else:
                shapes = (args[0].shape, args[3].shape)
                jargs = args
                nm_prefill, nm_gen = "dec_prefill_shared", "dec_gen_shared"
            if spec:
                fn = self._get_jit(nm_prefill, shapes, mn_pad)
                tok, cache = fn(pp, *jargs)
                Lp = args[0].shape[1]
                hist = np.full(
                    (B, prompt_len + mn_pad), self.tokenizer.pad_id,
                    np.int32,
                )
                hist[:, :Lp] = np.asarray(args[0])[np.asarray(args[2])]
                hist[:, Lp:prompt_len] = np.asarray(args[3])
                return self._decode_spec_chunked(
                    pp, tok, cache, hist, B, prompt_len, n,
                    max_new_tokens, chunk_tokens or 256, stop_strings,
                )
            if chunked:
                if sampling is not None:
                    k_pref, k_dec = jax.random.split(sampling[1])
                    fn = self._get_jit(
                        nm_prefill, shapes, max_new_tokens,
                        ("s", sampling[0]),
                    )
                    tok, cache = fn(pp, *jargs, k_pref)
                    samp = (sampling[0], k_dec)
                else:
                    fn = self._get_jit(
                        nm_prefill, shapes, max_new_tokens
                    )
                    tok, cache = fn(pp, *jargs)
                    samp = None
                return self._decode_chunked(
                    pp, tok, cache, B, prompt_len, n,
                    max_new_tokens, chunk_tokens, stop_strings,
                    sampling=samp,
                )
            fn = self._get_jit(nm_gen, shapes, max_new_tokens)
            return np.asarray(fn(pp, *jargs))[:n]
        if mix_chunk:
            # Per-row multi-adapter rows: one aug-params pytree carries
            # the adapter stack + row indices through prefill AND decode.
            names, idx = mix_chunk
        if spec:
            ids, mask, n, B = self._pad_batch_left(chunk, b_cap=row_limit)
            if mix_chunk:
                pp = self._aug_params(names, self._pad_idx(idx, B))
            prefill = self._get_jit("dec_prefill", ids.shape, mn_pad)
            tok, cache = prefill(pp, *self._put(ids, mask))
            L = ids.shape[1]
            hist = np.full(
                (B, L + mn_pad), self.tokenizer.pad_id, np.int32
            )
            hist[:, :L] = ids
            return self._decode_spec_chunked(
                pp, tok, cache, hist, B, L, n,
                max_new_tokens, chunk_tokens or 256, stop_strings,
            )
        if chunked:
            ids, mask, n, B = self._pad_batch_left(chunk, b_cap=row_limit)
            if mix_chunk:
                pp = self._aug_params(names, self._pad_idx(idx, B))
            if sampling is not None:
                k_pref, k_dec = jax.random.split(sampling[1])
                prefill = self._get_jit(
                    "dec_prefill", ids.shape, max_new_tokens,
                    ("s", sampling[0]),
                )
                tok, cache = prefill(pp, *self._put(ids, mask), k_pref)
                samp = (sampling[0], k_dec)
            else:
                prefill = self._get_jit(
                    "dec_prefill", ids.shape, max_new_tokens
                )
                tok, cache = prefill(pp, *self._put(ids, mask))
                samp = None
            return self._decode_chunked(
                pp, tok, cache, B, ids.shape[1], n,
                max_new_tokens, chunk_tokens, stop_strings,
                sampling=samp,
            )
        ids, mask, n, B = self._pad_batch_left(chunk, b_cap=row_limit)
        if mix_chunk:
            pp = self._aug_params(names, self._pad_idx(idx, B))
        fn = self._get_jit("dec_gen", ids.shape, max_new_tokens)
        return np.asarray(fn(pp, *self._put(ids, mask)))[:n]

    def _rr_prep(self, batch: List[List[int]], b_cap: int, P: int,
                 plain: bool = False, want_host: bool = False):
        """Pad a batch to the refill session's layout (prompt area exactly
        ``P`` positions): shared-prefix grouping when it pays and fits,
        else plain left padding (``plain`` forces it — mixed-adapter
        sessions, where prefix K/V would depend on the adapter).
        Returns (kind, device args, n_real); with ``want_host`` appends
        the _group host info (None on the plain path)."""
        grp = None if plain else self._group(
            batch, b_cap=b_cap, l_total=P, want_host=want_host
        )
        if grp is not None:
            if want_host:
                n, args, host = grp
                return "shared", args, n, host
            n, args = grp
            return "shared", args, n
        ids, mask, n, _ = self._pad_batch_left(batch, b_cap=b_cap, l_force=P)
        res = ("plain", self._put(ids, mask), n)
        return res + (None,) if want_host else res

    def _rr_prep_pre(self, batch: List[List[int]], n_real: int, Br: int,
                     host):
        """Lay a refill batch out against the SESSION's cached prefix K/V.

        Each real row must extend one of the session's unique prefixes
        (longest match wins; an empty-prefix session group accepts any
        row that fits the suffix area whole) — then only the suffix runs
        a forward pass (generate.decoder_refill_slots_pre). Returns
        (gidx np [Br], sids np, device (gidx, sids, smask)) or None when
        any real row doesn't match (caller falls back to the recompute
        paths). Rows past ``n_real`` are pad filler: they map to group 0
        with a pad suffix and their scatter slot is out of range, so the
        garbage result is dropped (mode="drop")."""
        pre_rows, _pids, _Lp, Ls = host
        pad_tok = self.tokenizer.pad_id
        order = sorted(range(len(pre_rows)), key=lambda g: -len(pre_rows[g]))
        gidx = np.zeros((Br,), np.int32)
        sufs: List[List[int]] = []
        for j, row in enumerate(batch[:n_real]):
            g = None
            for gi in order:
                p = pre_rows[gi]
                if (
                    len(p) < len(row) <= len(p) + Ls
                    and row[: len(p)] == p
                ):
                    g = gi
                    break
            if g is None:
                return None
            gidx[j] = g
            sufs.append(row[len(pre_rows[g]):])
        sufs += [[pad_tok]] * (Br - n_real)
        sids, smask, _, _ = self._pad_batch(sufs, b_cap=Br, l_force=Ls)
        sids_d, smask_d = self._put(sids, smask)
        gidx_d = jax.device_put(jnp.asarray(gidx), self._data_sharding)
        return gidx, sids, (gidx_d, sids_d, smask_d)

    def _generate_refill(
        self,
        pp,
        rows: List[List[int]],
        max_new: int,
        stop_strings: Sequence[str],
        chunk_tokens: int,
        row_limit: int,
        mix=None,  # (names, idx np [N]) per-row multi-adapter assignment
        sampling=None,  # (temperature, rng) categorical sampling
        pkv_key=_NO_PKV,  # adapter key for the cross-wave prefix cache
    ) -> np.ndarray:
        """Continuous-batching decode session over a multi-dispatch wave.

        One fixed-shape session (B slots, prompt area P, cache depth
        P + max_new) serves ALL rows: the first ``_chunks`` chunk prefills
        into the slots; at every ``chunk_tokens`` boundary, slots whose
        row finished (device EOS/budget freeze, or a host stop-string
        match) are re-prefilled from the pending rows and decode alongside
        the older rows — each row appends K/V at its own write position
        (generate.decoder_decode_chunk_rr) with a full ``max_new`` budget.
        vLLM-style slot refill (reference setwise.py:450-454); the frozen-
        row path this replaces wasted every freed row's dispatch slot
        until the chunk drained (VERDICT r3 missing #2).

        Memory: the refill prefill transient is bounded to ~B/4 rows at
        prompt-only depth (decoder_refill_slots never materializes the
        (P+max_new)-padded batch cache), inside _gen_row_limit's 30%
        headroom; the caller's RESOURCE_EXHAUSTED backoff remains the
        hard guarantee.

        Known trade: this loop synchronizes (device_get) at every chunk
        boundary — the refill decision needs the finished-slot set — so
        it gives up the dispatch pipelining of _decode_chunked (~28% of
        wall at chunk=64 on the tunneled TPU; a few % at the >=512-budget
        auto-chunk of 256 this path actually runs at). Pre-dispatching
        the next chunk was evaluated and rejected: it would waste one
        full frozen-row chunk of device compute per session whenever the
        last live rows finish inside the pre-dispatched chunk (the
        common case for EOS-variant Rank-R1 decodes — the very workload
        refill serves), which costs more than the host syncs it hides.
        Workloads where rows rarely finish early (uniform full-budget
        decodes) should set LLMRANKERS_NO_REFILL=1 and keep the
        pipelined frozen-row path.

        Determinism: given exact arithmetic the outputs are token-exact
        vs the per-chunk path (pinned on CPU, tests/test_refill.py). On
        TPU a pending row's prefill runs at a different BATCH shape than
        the per-chunk path would use, and XLA's batch-shape-dependent
        matmul tiling can flip a bf16 near-tie argmax — the same caveat
        as any batch-composition change (the reference admits analogous
        multi-GPU score drift, README.md:357).

        Returns the emitted-token matrix [len(rows), max_new] (pad filler
        after each row's EOS/stop), same contract as the per-chunk path.
        """
        N = len(rows)
        pad_tok = self.tokenizer.pad_id
        max_len = max(len(r) for r in rows)
        P = self._cap_len(_bucket(max_len, self.len_buckets), max_len)
        chunks = list(self._chunks(rows, row_limit))
        first = chunks[0][1]
        spec = self.spec_lookup > 0
        K = self.spec_lookup
        S = K + 1
        # Speculation pads the cache for budget-crossing verify blocks
        # (decoder_spec_decode_chunk docstring); refilled rows restart at
        # wp = P with the same slack, so one allocation serves all.
        mn_pad = max_new + 2 * S if spec else max_new

        def _hist_np(kind, args):
            """Token history laid out like the cache (spec drafting)."""
            if kind == "shared":
                Lp = args[0].shape[1]
                h = np.full((args[3].shape[0], P), pad_tok, np.int32)
                h[:, :Lp] = np.asarray(args[0])[np.asarray(args[2])]
                h[:, Lp:] = np.asarray(args[3])
                return h
            return np.asarray(args[0])

        kind0, args0, n0, sess_host = self._rr_prep(
            first, row_limit, P, plain=mix is not None, want_host=True
        )
        # Sampling streams: prefill first-tokens, decode steps (folded by
        # the session-global step inside the chunk fn), refill batches.
        skey = ("s", sampling[0]) if sampling else None
        if sampling:
            k_pref, k_dec, k_ref = jax.random.split(sampling[1], 3)
        sess_kv = None  # (ks, vs, pmask): session-cached prefix K/V
        sess_pre = None  # cross-wave cache-assembled prefix K/V
        if kind0 == "shared":
            sess_pre = (
                self._pkv_assemble(pp, pkv_key, sess_host)
                if pkv_key is not _NO_PKV else None
            )
            if sess_pre is not None:
                shapes = (sess_pre[0].shape, args0[3].shape)
                fn = self._get_jit(
                    "dec_prefill_pre", shapes, mn_pad, *(
                        (skey,) if skey else ()
                    )
                )
            else:
                shapes = (args0[0].shape, args0[3].shape)
                fn = self._get_jit(
                    "rr_prefill_shared", shapes, mn_pad, *(
                        (skey,) if skey else ()
                    )
                )
            B = args0[3].shape[0]
        else:
            fn = self._get_jit(
                "dec_prefill", args0[0].shape, mn_pad, *(
                    (skey,) if skey else ()
                )
            )
            B = args0[0].shape[0]
        slot_idx = None
        if mix is not None:
            names, idx_all = mix
            slot_idx = self._pad_idx(idx_all[:n0], B)
            pp = self._aug_params(names, slot_idx)
        if kind0 == "shared" and sess_pre is not None:
            # Cross-wave cache hit at session start: the prefix K/V is
            # already assembled, only suffixes prefill.
            tok, cache = fn(
                pp, sess_pre[0], sess_pre[1], args0[1], args0[2],
                args0[3], args0[4], *((k_pref,) if sampling else ())
            )
            sess_kv = (sess_pre[0], sess_pre[1], args0[1])
        elif kind0 == "shared":
            # Keep the initial dispatch's prefix K/V for the session:
            # refill batches whose rows extend the same prefixes (the
            # Rank-R1 wave shape) then skip the prefix forward entirely
            # (decoder_refill_slots_pre). Without it, the 800-token-
            # prefix refill A/B measured break-even (speedup 0.99) —
            # every refill re-ran the prefix prefill it shares with the
            # session. G x Lp K/V is a few tens of MB, kept for the
            # session only — and seeded into the cross-wave cache so
            # the NEXT wave of the same sort starts from a hit.
            tok, cache, sess_ks, sess_vs = fn(
                pp, *args0, *((k_pref,) if sampling else ())
            )
            sess_kv = (sess_ks, sess_vs, args0[1])
            if pkv_key is not _NO_PKV:
                self._pkv_insert(pkv_key, sess_host[0], sess_ks, sess_vs)
        else:
            tok, cache = fn(pp, *args0, *((k_pref,) if sampling else ()))
        pending = list(range(n0, N))

        dp = mesh_mod.batch_divisor(self.mesh)
        # Refill batch size: fixed per session (one compile), ~B/4 so the
        # prefill transient stays inside the row-limit headroom.
        Br = min(B, max(dp, -(-(B // 4) // dp) * dp))
        wp = jax.device_put(jnp.full((B,), P, jnp.int32), self._data_sharding)
        done_h = np.zeros((B,), bool)
        done_h[n0:] = True  # padding rows are free slots from the start
        done = jax.device_put(jnp.asarray(done_h), self._data_sharding)

        hist_d = None
        if spec:
            rounds = max(1, chunk_tokens // S)
            chunk_fn = self._get_jit(
                "dec_spec_chunk", B, P, max_new, rounds, K
            )
            h0 = np.full((B, P + mn_pad), pad_tok, np.int32)
            h0[:, :P] = _hist_np(kind0, args0)
            hist_d = jax.device_put(jnp.asarray(h0), self._data_sharding)
        else:
            chunk_fn = self._get_jit(
                "dec_chunk_rr", B, P, chunk_tokens, max_new,
                *((skey,) if skey else ()),
            )
        out_mat = np.full((N, max_new), int(self.cfg.pad_token_id), np.int32)
        acc: List[List[int]] = [[] for _ in range(B)]
        slot_rows: List[Optional[int]] = [
            i if i < n0 else None for i in range(B)
        ]
        live = n0
        refills = 0
        pre_hits = 0
        spec_tokens = spec_rounds = 0
        chunk_no = 0
        while True:
            chunk_no += 1
            if spec:
                outs, counts, (tok, cache, hist_d, wp, done) = chunk_fn(
                    pp, tok, cache, hist_d, wp, done
                )
                out_h, cnt_h, done_dev, wp_h = jax.device_get(
                    (outs, counts, done, wp)
                )
            else:
                if sampling:
                    out, tok, cache, wp, done = chunk_fn(
                        pp, tok, cache, wp, done, k_dec,
                        jnp.int32(chunk_no * chunk_tokens),
                    )
                else:
                    out, tok, cache, wp, done = chunk_fn(
                        pp, tok, cache, wp, done
                    )
                out_h, done_dev, wp_h = jax.device_get((out, done, wp))
            done_np = np.asarray(done_dev).copy()
            host_froze = False
            finished: List[int] = []
            for s in range(B):
                r = slot_rows[s]
                if r is None:
                    continue
                if spec:
                    for rd in range(out_h.shape[1]):
                        cnt = int(cnt_h[s, rd])
                        if not cnt:
                            continue
                        # Accept-rate stats count only tokens that survive
                        # the budget truncation (see _decode_spec_chunked).
                        kept = min(cnt, max(0, max_new - len(acc[s])))
                        if kept:
                            spec_tokens += kept
                            spec_rounds += 1
                        acc[s].extend(out_h[s, rd, :cnt].tolist())
                else:
                    acc[s].extend(out_h[s].tolist())
                fin = bool(done_np[s]) or int(wp_h[s]) - P >= max_new
                # The device freezes on cfg.eos_token_id; when the
                # tokenizer's EOS differs (e.g. Qwen2 chat EOS), the host
                # freezes on it here — same rule as _host_freeze.
                if (
                    not fin
                    and self.tokenizer.eos_id != int(self.cfg.eos_token_id)
                    and self.tokenizer.eos_id in acc[s][:max_new]
                ):
                    fin = True
                    done_np[s] = True
                    host_froze = True
                if not fin and stop_strings:
                    text = self.tokenizer.decode(
                        acc[s][:max_new], skip_special_tokens=True
                    )
                    if any(st in text for st in stop_strings):
                        fin = True
                        done_np[s] = True
                        host_froze = True
                if fin:
                    finished.append(s)
            for s in finished:
                r = slot_rows[s]
                row = acc[s][:max_new]
                out_mat[r, : len(row)] = row
                slot_rows[s] = None
                acc[s] = []
                live -= 1
            if host_froze:
                done = jax.device_put(
                    jnp.asarray(done_np), self._data_sharding
                )
            free = [s for s in range(B) if slot_rows[s] is None]
            # Refill policy: wait for a full refill batch of free slots
            # (bounds prefill-transient memory AND per-refill overhead)
            # unless nothing is live — then refill regardless to progress.
            while pending and free and (len(free) >= Br or live == 0):
                k = min(Br, len(pending), len(free))
                take, pending = pending[:k], pending[k:]
                use, free = free[:k], free[k:]
                batch = [rows[i] for i in take] + [[pad_tok]] * (Br - k)
                slots_np = np.full((Br,), B, np.int32)  # B = OOB -> drop
                slots_np[:k] = use
                slots_d = jnp.asarray(slots_np)
                # Session-cached prefix K/V first: when the refill rows
                # extend the initial dispatch's prefixes, only suffixes
                # run a forward (decoder_refill_slots_pre) — the
                # recompute paths below re-run the prefix prefill every
                # refill, which measured break-even on 800-token
                # prefixes (vLLM avoids this via PagedAttention block
                # reuse, reference setwise.py:450-454).
                pre = (
                    self._rr_prep_pre(batch, k, Br, sess_host)
                    if sess_kv is not None and mix is None else None
                )
                if pre is not None:
                    gidx_np, sids_np, dargs = pre
                    rfn = self._get_jit(
                        "rr_refill_pre", sess_host[2], sess_host[3],
                        *((skey,) if skey else ()),
                    )
                    tok, cache, wp, done = rfn(
                        pp, cache, tok, wp, done, *sess_kv, *dargs,
                        slots_d,
                        *((jax.random.fold_in(k_ref, refills),)
                          if sampling else ()),
                    )
                    pre_hits += 1
                    if spec:
                        Lp = sess_host[2]
                        hr = np.full((Br, P + mn_pad), pad_tok, np.int32)
                        hr[:, :Lp] = sess_host[1][gidx_np]
                        hr[:, Lp:P] = sids_np
                        hist_d = hist_d.at[slots_d].set(
                            jnp.asarray(hr), mode="drop"
                        )
                else:
                    kindr, argsr, _ = self._rr_prep(
                        batch, Br, P, plain=mix is not None
                    )
                    if kindr == "shared":
                        rfn = self._get_jit(
                            "rr_refill_shared",
                            (argsr[0].shape, argsr[3].shape),
                            *((skey,) if skey else ()),
                        )
                    else:
                        rfn = self._get_jit(
                            "rr_refill", argsr[0].shape,
                            *((skey,) if skey else ()),
                        )
                    pp_r = pp
                    if mix is not None:
                        idx_b = self._pad_idx(
                            np.asarray(
                                [idx_all[i] for i in take], np.int32
                            ), Br
                        )
                        pp_r = self._aug_params(names, idx_b)
                        slot_idx[np.asarray(use, np.int32)] = idx_b[:k]
                        pp = self._aug_params(names, slot_idx)
                    tok, cache, wp, done = rfn(
                        pp_r, cache, tok, wp, done, *argsr, slots_d,
                        *((jax.random.fold_in(k_ref, refills),)
                          if sampling else ()),
                    )
                    if spec:
                        hr = np.full((Br, P + mn_pad), pad_tok, np.int32)
                        hr[:, :P] = _hist_np(kindr, argsr)
                        hist_d = hist_d.at[slots_d].set(
                            jnp.asarray(hr), mode="drop"
                        )
                for slot, row_i in zip(use, take):
                    slot_rows[slot] = row_i
                    acc[slot] = []
                live += k
                refills += 1
            if live == 0 and not pending:
                break
        with self._stats_lock:
            self.refill_stats["sessions"] += 1
            self.refill_stats["refills"] += refills
            self.refill_stats["prefix_kv_hits"] += pre_hits
            if spec:
                self.spec_stats["tokens"] += spec_tokens
                self.spec_stats["rounds"] += spec_rounds
        return out_mat

    def _decode_chunked(
        self,
        pp,
        tok,
        cache,
        B: int,
        prompt_len: int,
        n: int,
        max_new_tokens: int,
        chunk_tokens: int,
        stop_strings: Sequence[str],
        sampling=None,  # (temperature, rng); rng constant across chunks —
        #                 the chunk fn folds it by the GLOBAL step t
    ) -> np.ndarray:
        """Decode from a prefilled cache in fixed-size chunks; between
        chunks the host decodes each live row and freezes rows whose text
        already contains a stop string (or EOS).

        Without stop strings the only freeze conditions (EOS + budget)
        already run ON DEVICE, so the loop pipelines: chunk i+1 is
        dispatched before chunk i's outputs are fetched, hiding the
        host<->device roundtrip (substantial over a tunneled TPU — ~28%
        of decode wall measured at Qwen2.5-3B shapes) behind device
        compute. Outputs are bit-identical either way: a chunk past
        all-done emits only pad filler, which stitching strips."""
        L = prompt_len
        skey = ("s", sampling[0]) if sampling else None
        rng = sampling[1] if sampling else None

        def _cfn(steps):
            if skey:
                return self._get_jit("dec_chunk", B, L, steps, skey)
            return self._get_jit("dec_chunk", B, L, steps)

        chunk_fn = _cfn(chunk_tokens)
        done = jnp.zeros((B,), bool)
        pieces: List[np.ndarray] = []
        offset = 0
        pipelined = (
            not stop_strings
            and self.tokenizer.eos_id == int(self.cfg.eos_token_id)
        )
        pending = None  # (out_dev, done_dev) of the previously dispatched chunk
        while offset < max_new_tokens:
            steps = min(chunk_tokens, max_new_tokens - offset)
            if steps < chunk_tokens:
                chunk_fn = _cfn(steps)
            if skey:
                out, tok, cache, done = chunk_fn(
                    pp, tok, cache, jnp.int32(offset), done, rng
                )
            else:
                out, tok, cache, done = chunk_fn(
                    pp, tok, cache, jnp.int32(offset), done
                )
            offset += steps
            if pipelined:
                prev, pending = pending, (out, done)
                if prev is not None:
                    out_h, done_h = jax.device_get(prev)
                    pieces.append(out_h)
                    if done_h.all():
                        # The just-dispatched chunk (pending) runs with
                        # every row frozen — all-pad output, drained below.
                        break
                continue
            pieces.append(np.asarray(out))
            if offset >= max_new_tokens:
                break
            # Host-side stop check on the live rows.
            acc = np.concatenate(pieces, axis=1)
            newly = self._host_freeze(
                np.asarray(done), lambda i: acc[i].tolist(), n, B,
                None, stop_strings,
            )
            if all(newly):
                break
            done = jnp.asarray(np.asarray(newly, bool))
        if pending is not None:  # drain the in-flight chunk
            pieces.append(jax.device_get(pending[0]))
        out = np.concatenate(pieces, axis=1)
        if out.shape[1] < max_new_tokens:
            out = np.pad(
                out, ((0, 0), (0, max_new_tokens - out.shape[1])),
                constant_values=self.tokenizer.pad_id,
            )
        return out[:n]

    def _host_freeze(
        self,
        done_h: np.ndarray,
        row_tokens,  # callable: row index -> emitted token list
        n: int,
        B: int,
        max_new_tokens: Optional[int],
        stop_strings: Sequence[str],
    ) -> List[bool]:
        """Between-chunk freeze decisions shared by the plain and
        speculative decode loops: a live row freezes on tokenizer EOS, a
        decoded stop string, or (when given) an exhausted budget; padding
        rows are always frozen."""
        eos = self.tokenizer.eos_id
        newly = list(done_h)
        for i in range(n):
            if newly[i]:
                continue
            row = row_tokens(i)
            if max_new_tokens is not None and len(row) >= max_new_tokens:
                newly[i] = True
                continue
            if eos in row:
                newly[i] = True
                continue
            text = self.tokenizer.decode(row, skip_special_tokens=True)
            if any(s in text for s in stop_strings):
                newly[i] = True
        for i in range(n, B):
            newly[i] = True
        return newly

    def _decode_spec_chunked(
        self,
        pp,
        tok,
        cache,
        hist: np.ndarray,  # [B, T] token layout matching the cache
        B: int,
        prompt_len: int,
        n: int,
        max_new_tokens: int,
        chunk_tokens: int,
        stop_strings: Sequence[str],
    ) -> np.ndarray:
        """Prompt-lookup speculative decoding loop: fixed-size chunks of
        verify rounds on device, host stop-string checks between chunks.
        Emits the SAME tokens as `_decode_chunked` (greedy acceptance);
        rounds yield 1..K+1 tokens each, so rows advance unevenly and the
        host stitches per-row variable-length round outputs."""
        K = self.spec_lookup
        S = K + 1
        rounds = max(1, chunk_tokens // S)
        fn = self._get_jit(
            "dec_spec_chunk", B, prompt_len, max_new_tokens, rounds, K
        )
        wp = jnp.full((B,), prompt_len, jnp.int32)
        done = jnp.zeros((B,), bool)
        hist_d = jax.device_put(jnp.asarray(hist), self._data_sharding)
        rows_out: List[List[int]] = [[] for _ in range(B)]
        # Accumulate accept-rate stats per call, merged under the stats
        # lock at the end: generate() runs concurrently from cohort and
        # server threads, and bare += on the shared dict loses updates.
        local_tokens = 0
        local_rounds = 0

        def stitch(outs_h, counts_h):
            nonlocal local_tokens, local_rounds
            for b in range(n):
                for r in range(rounds):
                    cnt = int(counts_h[b, r])
                    if not cnt:
                        continue
                    # Accept-rate stats count only tokens that survive the
                    # budget truncation — a budget-crossing round consumes
                    # up to K extra tokens that are never emitted.
                    kept = min(cnt, max(0, max_new_tokens - len(rows_out[b])))
                    if kept:
                        local_tokens += kept
                        local_rounds += 1
                    rows_out[b].extend(outs_h[b, r, :cnt].tolist())

        # Without stop strings, EOS + budget freezing both run on device,
        # so the loop pipelines one chunk deep (see _decode_chunked): the
        # fetch of chunk i overlaps chunk i+1's device compute. A chunk
        # dispatched past all-done emits zero counts — stitch is a no-op.
        pipelined = (
            not stop_strings
            and self.tokenizer.eos_id == int(self.cfg.eos_token_id)
        )
        pending = None
        while True:
            outs, counts, (tok, cache, hist_d, wp, done_dev) = fn(
                pp, tok, cache, hist_d, wp, done
            )
            if pipelined:
                done = done_dev
                prev, pending = pending, (outs, counts, done_dev)
                if prev is not None:
                    outs_h, counts_h, done_h = jax.device_get(prev)
                    stitch(outs_h, counts_h)
                    if done_h.all():
                        break
                continue
            outs_h, counts_h, done_h = jax.device_get(
                (outs, counts, done_dev)
            )
            stitch(outs_h, counts_h)
            newly = self._host_freeze(
                done_h, lambda i: rows_out[i], n, B,
                max_new_tokens, stop_strings,
            )
            if all(newly):
                break
            done = jnp.asarray(np.asarray(newly, bool))
        if pending is not None:  # drain the in-flight chunk
            outs_h, counts_h, _ = jax.device_get(pending)
            stitch(outs_h, counts_h)
        with self._stats_lock:
            self.spec_stats["tokens"] += local_tokens
            self.spec_stats["rounds"] += local_rounds
        out = np.full((n, max_new_tokens), self.tokenizer.pad_id, np.int32)
        for i in range(n):
            row = rows_out[i][:max_new_tokens]
            out[i, : len(row)] = row
        return out

    # ------------------------------------------------------------------
    # jit builders
    # ------------------------------------------------------------------
    def _get_jit(self, name: str, *key):
        k = (name,) + tuple(key)
        if k not in self._jit_cache:
            self._jit_cache[k] = self._build(name, *key)
        return self._jit_cache[k]

    def _build(self, name: str, *key):
        cfg = self.cfg
        # Trailing ("s", temperature) key element selects the SAMPLED
        # variant of a generation wrapper: the fn gains a trailing rng
        # arg and picks tokens categorically (generate._pick). A
        # distinct jit-cache key, so greedy callers never pay for it.
        samp = None
        if key and isinstance(key[-1], tuple) and len(key[-1]) == 2 \
                and key[-1][0] == "s":
            samp = float(key[-1][1])
            key = key[:-1]
        if name == "t5_labels":
            _, labels, prefix = key
            label_arr = jnp.asarray(list(labels), jnp.int32)

            def fn(params, ids, mask):
                B = ids.shape[0]
                pref = jnp.tile(jnp.asarray(list(prefix), jnp.int32)[None], (B, 1))
                enc_out = t5_mod.encode(params, cfg, ids, mask)
                hidden = t5_mod.decode_hidden(params, cfg, pref, enc_out, mask)
                out = t5_mod.label_logits(params, cfg, hidden[:, -1, :], label_arr)
                return out.astype(jnp.float32)

            return jax.jit(fn)
        if name == "dec_labels":
            _, labels, _prefix = key
            label_arr = jnp.asarray(list(labels), jnp.int32)

            def fn(params, ids, mask):
                hidden, _ = dec_mod.forward_hidden(params, cfg, ids, mask)
                # Left-padded: last position is the last real token.
                out = dec_mod.label_logits(params, cfg, hidden[:, -1, :], label_arr)
                return out.astype(jnp.float32)

            return jax.jit(fn)
        if name == "prefix_kv":
            # Standalone unique-prefix forward for the cross-wave
            # prefix-KV cache (_pkv_assemble): [G, Lp] -> per-layer K/V
            # [Ld, G, KV, Lp, Dh] x2. jax.jit respecializes per shape.

            def fn(params, pids, pmask):
                return gen_mod.decoder_prefix_kv(params, cfg, pids, pmask)

            return jax.jit(fn)
        if name in ("dec_labels_pre", "dec_gen_pre", "dec_prefill_pre"):
            # Consumers of CACHE-ASSEMBLED prefix K/V: identical math to
            # the *_shared family below, minus the in-jit prefix forward
            # (ks/vs arrive as inputs from _pkv_assemble). NOT donated —
            # the cache keeps the entries across waves.
            if name == "dec_labels_pre":
                (kshape, sshape), labels = key
                label_arr = jnp.asarray(list(labels), jnp.int32)
                max_new = None
            else:
                (kshape, sshape), max_new = key
            prompt_len = kshape[3] + sshape[1]

            def pre_core(params, ks, vs, pmask, gidx, sids, smask, mn):
                kpre = jnp.take(ks, gidx, axis=1)
                vpre = jnp.take(vs, gidx, axis=1)
                pmask_b = jnp.take(pmask, gidx, axis=0)
                return gen_mod.decoder_shared_prefill(
                    params, cfg, kpre, vpre, pmask_b, sids, smask, mn
                )

            if name == "dec_labels_pre":

                def fn(params, ks, vs, pmask, gidx, sids, smask):
                    last_h, _ = pre_core(
                        params, ks, vs, pmask, gidx, sids, smask, None
                    )
                    out = dec_mod.label_logits(params, cfg, last_h, label_arr)
                    return out.astype(jnp.float32)

            elif name == "dec_prefill_pre":
                if samp is not None:

                    def fn(params, ks, vs, pmask, gidx, sids, smask, rng):
                        last_h, cache = pre_core(
                            params, ks, vs, pmask, gidx, sids, smask,
                            max_new,
                        )
                        logits = dec_mod.lm_logits(params, cfg, last_h)
                        return (
                            gen_mod._pick(logits, samp, rng, jnp.int32),
                            cache,
                        )
                else:

                    def fn(params, ks, vs, pmask, gidx, sids, smask):
                        last_h, cache = pre_core(
                            params, ks, vs, pmask, gidx, sids, smask,
                            max_new,
                        )
                        logits = dec_mod.lm_logits(params, cfg, last_h)
                        return (
                            jnp.argmax(logits, axis=-1).astype(jnp.int32),
                            cache,
                        )

            else:  # dec_gen_pre

                def fn(params, ks, vs, pmask, gidx, sids, smask):
                    last_h, cache = pre_core(
                        params, ks, vs, pmask, gidx, sids, smask, max_new
                    )
                    logits = dec_mod.lm_logits(params, cfg, last_h)
                    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return gen_mod.decoder_greedy_decode(
                        params, cfg, first, cache, prompt_len, max_new,
                        cfg.eos_token_id,
                    )

            return jax.jit(fn)
        if name in ("dec_labels_shared", "dec_gen_shared",
                    "dec_prefill_shared", "rr_prefill_shared"):
            # Shared-prefix paths: prefill each unique prompt prefix once
            # ([G, Lp]), rows gather their group's K/V, then only suffixes
            # run the full-width prefill. vLLM prefix-caching equivalent
            # (setwise.py:450-454; SURVEY.md §7 layer-2 plan).
            if name == "dec_labels_shared":
                (pshape, sshape), labels = key
                label_arr = jnp.asarray(list(labels), jnp.int32)
                max_new = None
            else:
                (pshape, sshape), max_new = key
            prompt_len = pshape[1] + sshape[1]

            def shared_core(params, pids, pmask, gidx, sids, smask, max_new_):
                ks, vs = gen_mod.decoder_prefix_kv(params, cfg, pids, pmask)
                kpre = jnp.take(ks, gidx, axis=1)
                vpre = jnp.take(vs, gidx, axis=1)
                pmask_b = jnp.take(pmask, gidx, axis=0)
                last_h, cache = gen_mod.decoder_shared_prefill(
                    params, cfg, kpre, vpre, pmask_b, sids, smask, max_new_
                )
                return last_h, cache, ks, vs

            if name == "dec_labels_shared":

                def fn(params, pids, pmask, gidx, sids, smask):
                    last_h, _, _, _ = shared_core(
                        params, pids, pmask, gidx, sids, smask, None
                    )
                    out = dec_mod.label_logits(params, cfg, last_h, label_arr)
                    return out.astype(jnp.float32)

            elif name == "rr_prefill_shared":
                # Refill-session variant: ALSO returns the per-group
                # prefix K/V so the session can hand it to
                # rr_refill_pre — refills then skip the prefix forward.
                if samp is not None:

                    def fn(params, pids, pmask, gidx, sids, smask, rng):
                        last_h, cache, ks, vs = shared_core(
                            params, pids, pmask, gidx, sids, smask, max_new
                        )
                        logits = dec_mod.lm_logits(params, cfg, last_h)
                        return (
                            gen_mod._pick(logits, samp, rng, jnp.int32),
                            cache, ks, vs,
                        )
                else:

                    def fn(params, pids, pmask, gidx, sids, smask):
                        last_h, cache, ks, vs = shared_core(
                            params, pids, pmask, gidx, sids, smask, max_new
                        )
                        logits = dec_mod.lm_logits(params, cfg, last_h)
                        return (
                            jnp.argmax(logits, axis=-1).astype(jnp.int32),
                            cache, ks, vs,
                        )

            elif name == "dec_prefill_shared":
                if samp is not None:

                    def fn(params, pids, pmask, gidx, sids, smask, rng):
                        last_h, cache, _, _ = shared_core(
                            params, pids, pmask, gidx, sids, smask, max_new
                        )
                        logits = dec_mod.lm_logits(params, cfg, last_h)
                        return gen_mod._pick(
                            logits, samp, rng, jnp.int32
                        ), cache
                else:

                    def fn(params, pids, pmask, gidx, sids, smask):
                        last_h, cache, _, _ = shared_core(
                            params, pids, pmask, gidx, sids, smask, max_new
                        )
                        logits = dec_mod.lm_logits(params, cfg, last_h)
                        return (
                            jnp.argmax(logits, axis=-1).astype(jnp.int32),
                            cache,
                        )

            else:  # dec_gen_shared

                def fn(params, pids, pmask, gidx, sids, smask):
                    last_h, cache, _, _ = shared_core(
                        params, pids, pmask, gidx, sids, smask, max_new
                    )
                    logits = dec_mod.lm_logits(params, cfg, last_h)
                    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return gen_mod.decoder_greedy_decode(
                        params, cfg, first, cache, prompt_len, max_new,
                        cfg.eos_token_id,
                    )

            return jax.jit(fn)
        if name == "t5_nll":

            def fn(params, ids, mask, tgt, tw):
                B = ids.shape[0]
                start = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)
                dec_in = jnp.concatenate([start, tgt[:, :-1]], axis=1)
                logits = t5_mod.forward(params, cfg, ids, mask, dec_in)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
                return jnp.sum(tok_lp * tw, axis=-1)  # negative CE = sum log p

            return jax.jit(fn)
        if name == "t5_gen":
            _, prefix, max_new = key

            def fn(params, ids, mask):
                B = ids.shape[0]
                pref = jnp.tile(jnp.asarray(list(prefix), jnp.int32)[None], (B, 1))
                return gen_mod.t5_greedy_generate(params, cfg, ids, mask, pref, max_new)

            return jax.jit(fn)
        if name == "dec_gen":
            _, max_new = key

            def fn(params, ids, mask):
                logits, cache = gen_mod.decoder_prefill(params, cfg, ids, mask, max_new)
                first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return gen_mod.decoder_greedy_decode(
                    params, cfg, first, cache, ids.shape[1], max_new, cfg.eos_token_id
                )

            return jax.jit(fn)
        if name == "dec_prefill":
            _, max_new = key

            if samp is not None:

                def fn(params, ids, mask, rng):
                    logits, cache = gen_mod.decoder_prefill(
                        params, cfg, ids, mask, max_new
                    )
                    return gen_mod._pick(logits, samp, rng, jnp.int32), cache
            else:

                def fn(params, ids, mask):
                    logits, cache = gen_mod.decoder_prefill(
                        params, cfg, ids, mask, max_new
                    )
                    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return first, cache

            return jax.jit(fn)
        if name == "dec_chunk":
            _, prompt_len, steps = key

            if samp is not None:

                def fn(params, tok, cache, offset, done, rng):
                    out, (tok2, cache2, done2) = gen_mod.decoder_decode_chunk(
                        params, cfg, tok, cache, prompt_len, offset, steps,
                        cfg.eos_token_id, done=done,
                        temperature=samp, rng=rng,
                    )
                    return out, tok2, cache2, done2
            else:

                def fn(params, tok, cache, offset, done):
                    out, (tok2, cache2, done2) = gen_mod.decoder_decode_chunk(
                        params, cfg, tok, cache, prompt_len, offset, steps,
                        cfg.eos_token_id, done=done,
                    )
                    return out, tok2, cache2, done2

            return jax.jit(fn, donate_argnums=(2,))
        if name == "dec_chunk_rr":
            _, prompt_len, steps, max_new = key

            if samp is not None:

                def fn(params, tok, cache, wp, done, rng, step0):
                    out, (tok2, cache2, wp2, done2) = (
                        gen_mod.decoder_decode_chunk_rr(
                            params, cfg, tok, cache, wp, prompt_len,
                            max_new, steps, cfg.eos_token_id, done,
                            temperature=samp, rng=rng, step0=step0,
                        )
                    )
                    return out, tok2, cache2, wp2, done2
            else:

                def fn(params, tok, cache, wp, done):
                    out, (tok2, cache2, wp2, done2) = (
                        gen_mod.decoder_decode_chunk_rr(
                            params, cfg, tok, cache, wp, prompt_len,
                            max_new, steps, cfg.eos_token_id, done,
                        )
                    )
                    return out, tok2, cache2, wp2, done2

            return jax.jit(fn, donate_argnums=(2,))
        if name == "rr_refill":

            if samp is not None:

                def fn(params, cache, tok, wp, done, ids, mask, slots, rng):
                    return gen_mod.decoder_refill_slots(
                        params, cfg, cache, tok, wp, done, ids, mask,
                        slots, temperature=samp, rng=rng,
                    )
            else:

                def fn(params, cache, tok, wp, done, ids, mask, slots):
                    return gen_mod.decoder_refill_slots(
                        params, cfg, cache, tok, wp, done, ids, mask, slots
                    )

            return jax.jit(fn, donate_argnums=(1,))
        if name == "rr_refill_shared":

            if samp is not None:

                def fn(params, cache, tok, wp, done, pids, pmask, gidx,
                       sids, smask, slots, rng):
                    return gen_mod.decoder_refill_slots_shared(
                        params, cfg, cache, tok, wp, done, pids, pmask,
                        gidx, sids, smask, slots,
                        temperature=samp, rng=rng,
                    )
            else:

                def fn(params, cache, tok, wp, done, pids, pmask, gidx,
                       sids, smask, slots):
                    return gen_mod.decoder_refill_slots_shared(
                        params, cfg, cache, tok, wp, done, pids, pmask,
                        gidx, sids, smask, slots,
                    )

            return jax.jit(fn, donate_argnums=(1,))
        if name == "rr_refill_pre":
            # Refill against the SESSION's cached prefix K/V (ks/vs from
            # rr_prefill_shared): only the suffix tokens run a forward.

            if samp is not None:

                def fn(params, cache, tok, wp, done, ks, vs, pmask,
                       gidx, sids, smask, slots, rng):
                    return gen_mod.decoder_refill_slots_pre(
                        params, cfg, cache, tok, wp, done, ks, vs,
                        pmask, gidx, sids, smask, slots,
                        temperature=samp, rng=rng,
                    )
            else:

                def fn(params, cache, tok, wp, done, ks, vs, pmask,
                       gidx, sids, smask, slots):
                    return gen_mod.decoder_refill_slots_pre(
                        params, cfg, cache, tok, wp, done, ks, vs,
                        pmask, gidx, sids, smask, slots,
                    )

            return jax.jit(fn, donate_argnums=(1,))
        if name == "dec_spec_chunk":
            _, prompt_len, max_new, rounds, K = key

            def fn(params, tok, cache, hist, wp, done):
                return gen_mod.decoder_spec_decode_chunk(
                    params, cfg, tok, cache, hist, wp, prompt_len,
                    max_new, rounds, K, cfg.eos_token_id, done=done,
                )

            return jax.jit(fn, donate_argnums=(2, 3))
        raise KeyError(name)
