"""HuggingFace checkpoint loading: safetensors -> quantized LlamaParams.

The reference rides HF ``from_pretrained(load_in_4bit=True)`` and
quantizes lazily on device placement (reference core.py:139-161,
README.md:112). Here HF is only a *format*: ``config.json`` +
safetensors shards are read directly (per-tensor streaming via
``safe_open`` — peak host memory is one dense tensor), each weight is
quantized on device by the jitted quantizer, and the result is placed
directly into its mesh sharding when one is given.

Also implements the bnb-schema pre-quantized checkpoint save/load the
reference only defines keys for (``valid_qs_keys``, reference
core.py:29-42, has no save/load code): ``save_quantized`` /
``load_quantized`` round-trip packed payloads + absmax statistics
through safetensors.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import QuantConfig
from .llama import (
    KVCache,
    LlamaConfig,
    LlamaLayer,
    LlamaParams,
    QLinear,
    quantize_linear,
)

__all__ = [
    "config_from_hf",
    "config_to_hf",
    "load_hf_llama",
    "save_quantized",
    "load_quantized",
    "save_bnb_checkpoint",
]


def config_from_hf(model_dir: str,
                   quant: Optional[QuantConfig] = None) -> LlamaConfig:
    """Build :class:`LlamaConfig` from an HF ``config.json``.

    A pre-quantized bnb checkpoint dictates its own quant type — the
    stored codes are FP4 or NF4 bytes and decoding them with the other
    codebook silently corrupts every weight. When the HF config carries
    ``quantization_config.bnb_4bit_quant_type`` it overrides the
    requested ``quant.quant_type`` (reference core.py:29-42: the stored
    ``quant_state`` is authoritative for bnb consumers too).
    """
    import dataclasses

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    qc = hf.get("quantization_config") or {}
    stored_qt = qc.get("bnb_4bit_quant_type")
    # only a genuine bnb 4-bit stanza is authoritative: HF serializes
    # bnb_4bit_quant_type even for 8-bit configs, and stale stanzas on
    # de-quantized/merged checkpoints must not override an explicit
    # request (load_hf_llama's tensor sniff remains the backstop)
    if (stored_qt and qc.get("quant_method") == "bitsandbytes"
            and qc.get("load_in_4bit", False)):
        quant = dataclasses.replace(quant or QuantConfig(),
                                    quant_type=stored_qt)
    rs = hf.get("rope_scaling") or None
    rope_scaling = None
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        rope_scaling = (
            float(rs["factor"]),
            float(rs["low_freq_factor"]),
            float(rs["high_freq_factor"]),
            int(rs["original_max_position_embeddings"]),
        )
    head_dim = hf.get("head_dim") or (
        hf["hidden_size"] // hf["num_attention_heads"])
    archs = hf.get("architectures", [])
    gemma2 = any(a.startswith("Gemma2") for a in archs)
    qwen3 = any(a.startswith("Qwen3") for a in archs)
    gemma_kw = {}
    if gemma2:
        lt = hf.get("layer_types")
        if lt:
            sliding = ("even" if lt[0] == "sliding_attention" else "odd")
        else:
            # transformers Gemma2 default: sliding on even layer indices
            sliding = "even"
        gemma_kw = dict(
            hidden_activation="gelu_tanh",
            post_norms=True,
            norm_plus_one=True,
            embed_normalizer=True,
            attn_logit_softcap=hf.get("attn_logit_softcapping"),
            final_logit_softcap=hf.get("final_logit_softcapping"),
            query_scale=hf.get("query_pre_attn_scalar"),
            sliding_layers=sliding,
        )
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get(
            "num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=float(hf.get("rope_theta", 500000.0)),
        rms_norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
        max_position_embeddings=hf.get("max_position_embeddings", 8192),
        tie_word_embeddings=bool(hf.get("tie_word_embeddings", False)),
        rope_scaling=rope_scaling,
        # Qwen2-family checkpoints carry additive qkv bias; HF Llama
        # configs expose "attention_bias" (default off), Qwen2 models
        # imply it via the architecture name
        attention_bias=bool(hf.get(
            "attention_bias",
            any(a.startswith("Qwen2") for a in hf.get("architectures", [])))),
        # Mistral ships "sliding_window"; Qwen2 carries the field but
        # gates it behind "use_sliding_window" (default off there)
        sliding_window=(hf.get("sliding_window")
                        if hf.get("use_sliding_window",
                                  not any(a.startswith("Qwen2")
                                          for a in hf.get("architectures",
                                                          [])))
                        else None),
        quant=quant or QuantConfig(),
        qk_norm=qwen3,
        **gemma_kw,
    )


def _tensor_reader(model_dir: str) -> Callable[[str], jnp.ndarray]:
    """Per-tensor streaming reader over the model's safetensors shard(s)."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    name2file: Dict[str, str] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            name2file = json.load(f)["weight_map"]
    else:
        single = os.path.join(model_dir, "model.safetensors")
        if not os.path.exists(single):
            raise FileNotFoundError(f"no safetensors in {model_dir}")
        from safetensors import safe_open as _so

        with _so(single, framework="flax") as f:
            for k in f.keys():
                name2file[k] = "model.safetensors"

    handles: Dict[str, Any] = {}

    def read(name: str) -> jnp.ndarray:
        fname = name2file[name]
        if fname not in handles:
            handles[fname] = safe_open(
                os.path.join(model_dir, fname), framework="flax")
        return handles[fname].get_tensor(name)

    read.names = set(name2file)  # type: ignore[attr-defined]
    return read


def load_hf_llama(
    model_dir: str,
    quant: Optional[QuantConfig] = None,
    mesh=None,
    dtype: Any = jnp.bfloat16,
) -> Tuple[LlamaConfig, LlamaParams]:
    """Load + quantize an HF Llama checkpoint.

    Weights stream one tensor at a time through host memory, are
    quantized on device (jitted ``quantize_linear``), and when ``mesh``
    is given each quantized tensor is placed into its TP sharding
    immediately — the dense model never materializes anywhere.
    """
    read = _tensor_reader(model_dir)
    # pre-quantized bnb tensors dictate the quant type even when
    # config.json lacks a quantization_config stanza (synthesized /
    # hand-assembled checkpoints): the flat quant_state key embeds it
    stored = {"nf4" if n.endswith("bitsandbytes__nf4") else "fp4"
              for n in read.names
              if ".weight.quant_state.bitsandbytes__" in n}
    if len(stored) > 1:
        raise ValueError(f"mixed bnb quant types in checkpoint: {stored}")
    if stored:
        import dataclasses

        quant = dataclasses.replace(quant or QuantConfig(),
                                    quant_type=stored.pop())
    cfg = config_from_hf(model_dir, quant)
    q = cfg.quant

    specs = None
    if mesh is not None:
        from jax.sharding import NamedSharding

        from ..parallel.shard import llama_param_pspecs

        specs = jax.tree.map(lambda s: NamedSharding(mesh, s),
                             llama_param_pspecs(cfg))

    def place(x, spec_path=None):
        if specs is None or spec_path is None:
            return x
        return jax.device_put(x, spec_path)

    def qlin(name: str, spec=None, layout: str = "auto") -> QLinear:
        prefix = name[: -len(".weight")]
        from ..quant.bnb_io import (
            is_bnb_quantized, parse_bnb_flat, qlinear_arrays_from_bnb)

        if is_bnb_quantized(read.names, prefix):
            # pre-quantized bnb checkpoint (HF flat-key serialization):
            # take the stored codes/statistics verbatim instead of
            # re-quantizing — drop-in parity with the reference's bnb
            # consumers (reference core.py:29-42 key schema)
            packed, state = parse_bnb_flat(read, read.names, prefix)
            if state.quant_type != q.quant_type:
                raise ValueError(
                    f"{prefix}: stored bnb codes are {state.quant_type} "
                    f"but the model is configured {q.quant_type}")
            lay = layout
            if lay == "auto":
                # both codebooks default to the pair layout (NF4 via
                # the gather+tree dual-issue mix — same rule as
                # quantize_linear's auto)
                lay = "pair" if state.shape[0] % 2 == 0 else "planar"
            wp, scales = qlinear_arrays_from_bnb(packed, state, layout=lay)
            if q.scales_dtype == "bf16x2" and lay == "pair":
                from ..ops.qmatmul import pack_scale_pairs

                ql = QLinear(wp=wp, scales=pack_scale_pairs(scales))
            elif q.scales_dtype == "bf16x2":
                # planar (row-sharded) weights keep fp32 scales
                ql = QLinear(wp=wp, scales=scales.astype(jnp.float32))
            else:
                ql = QLinear(wp=wp, scales=scales.astype(q.scales_dtype))
        else:
            W = read(name)
            ql = quantize_linear(
                W, blocksize=q.blocksize, quant_type=q.quant_type,
                compress_statistics=q.compress_statistics,
                scales_dtype=q.scales_dtype, layout=layout,
            )
        if spec is not None:
            ql = QLinear(wp=jax.device_put(ql.wp, spec.wp),
                         scales=jax.device_put(ql.scales, spec.scales))
        return ql

    lspec = specs.layers if specs is not None else None

    def layer_slice(attr):
        # per-layer sharding spec: drop the leading L axis from the spec
        if lspec is None:
            return None
        from jax.sharding import NamedSharding

        s = getattr(lspec, attr)
        if isinstance(s, QLinear):
            return QLinear(
                wp=NamedSharding(mesh, jax.sharding.PartitionSpec(
                    *s.wp.spec[1:])),
                scales=NamedSharding(mesh, jax.sharding.PartitionSpec(
                    *s.scales.spec[1:])),
            )
        return None

    def bias(name):
        if not cfg.attention_bias:
            return None
        return read(name).astype(jnp.bfloat16)

    per_layer = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        if cfg.post_norms:
            # Gemma sandwich norms: post_attention_layernorm is the
            # POST-attn norm; the pre-MLP norm is pre_feedforward
            mlp_norm_name = p + "pre_feedforward_layernorm.weight"
            post_attn = read(p + "post_attention_layernorm.weight"
                             ).astype(jnp.bfloat16)
            post_mlp = read(p + "post_feedforward_layernorm.weight"
                            ).astype(jnp.bfloat16)
        else:
            mlp_norm_name = p + "post_attention_layernorm.weight"
            post_attn = post_mlp = None
        per_layer.append(LlamaLayer(
            attn_norm=read(p + "input_layernorm.weight").astype(jnp.bfloat16),
            q=qlin(p + "self_attn.q_proj.weight", layer_slice("q")),
            k=qlin(p + "self_attn.k_proj.weight", layer_slice("k")),
            v=qlin(p + "self_attn.v_proj.weight", layer_slice("v")),
            q_bias=bias(p + "self_attn.q_proj.bias"),
            k_bias=bias(p + "self_attn.k_proj.bias"),
            v_bias=bias(p + "self_attn.v_proj.bias"),
            o=qlin(p + "self_attn.o_proj.weight", layer_slice("o"),
                   layout="planar" if mesh is not None else "auto"),
            mlp_norm=read(mlp_norm_name).astype(jnp.bfloat16),
            gate=qlin(p + "mlp.gate_proj.weight", layer_slice("gate")),
            up=qlin(p + "mlp.up_proj.weight", layer_slice("up")),
            down=qlin(p + "mlp.down_proj.weight", layer_slice("down"),
                      layout="planar" if mesh is not None else "auto"),
            post_attn_norm=post_attn,
            post_mlp_norm=post_mlp,
            q_norm=(read(p + "self_attn.q_norm.weight").astype(jnp.bfloat16)
                    if cfg.qk_norm else None),
            k_norm=(read(p + "self_attn.k_norm.weight").astype(jnp.bfloat16)
                    if cfg.qk_norm else None),
        ))
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if specs is not None:
        layers = jax.tree.map(jax.device_put, layers, specs.layers)

    embed_w = read("model.embed_tokens.weight")
    if q.quantize_embedding:
        # row-gathered at lookup — packed row-pair scales don't apply
        embed = quantize_linear(
            embed_w, blocksize=q.blocksize, quant_type=q.quant_type,
            compress_statistics=q.compress_statistics,
            scales_dtype=(jnp.bfloat16 if q.scales_dtype == "bf16x2"
                          else q.scales_dtype))
    else:
        embed = embed_w.astype(jnp.bfloat16)
    if cfg.tie_word_embeddings or "lm_head.weight" not in read.names:
        head_w = embed_w.astype(jnp.float32)
    else:
        head_w = read("lm_head.weight").astype(jnp.float32)
    if q.quantize_lm_head:
        lm_head = quantize_linear(
            head_w, blocksize=q.blocksize, quant_type=q.quant_type,
            compress_statistics=q.compress_statistics,
            scales_dtype=q.scales_dtype,
        )
        if specs is not None:
            lm_head = QLinear(
                wp=jax.device_put(lm_head.wp, specs.lm_head.wp),
                scales=jax.device_put(lm_head.scales, specs.lm_head.scales),
            )
    else:
        lm_head = head_w.astype(jnp.bfloat16)
        if specs is not None:
            lm_head = jax.device_put(lm_head, specs.lm_head)

    final_norm = read("model.norm.weight").astype(jnp.bfloat16)
    if specs is not None:
        embed = jax.tree.map(jax.device_put, embed, specs.embed)
        final_norm = jax.device_put(final_norm, specs.final_norm)

    params = LlamaParams(embed=embed, layers=layers,
                         final_norm=final_norm, lm_head=lm_head)
    return cfg, params


# --------------------------------------------------------------------------
# Pre-quantized checkpoints (bnb key schema, reference core.py:29-42)
# --------------------------------------------------------------------------

def _iter_qlinears(params: LlamaParams) -> Iterator[Tuple[str, Any]]:
    yield "embed", params.embed
    yield "final_norm", params.final_norm
    yield "layers.attn_norm", params.layers.attn_norm
    yield "layers.mlp_norm", params.layers.mlp_norm
    for attr in ("q", "k", "v", "o", "gate", "up", "down"):
        yield f"layers.{attr}", getattr(params.layers, attr)
    # optional family leaves: qkv biases (Qwen2), sandwich norms
    # (Gemma-2), per-head qk norms (Qwen3)
    for attr in ("q_bias", "k_bias", "v_bias", "post_attn_norm",
                 "post_mlp_norm", "q_norm", "k_norm"):
        leaf = getattr(params.layers, attr)
        if leaf is not None:
            yield f"layers.{attr}", leaf
    yield "lm_head", params.lm_head


def save_quantized(params: LlamaParams, path: str) -> None:
    """Save quantized params to one safetensors file.

    QLinear tensors use bnb-style key pairs ``<name>.weight.packed`` /
    ``<name>.weight.absmax`` (scales here are the *resolved* fp32 absmax
    — the runtime layout; the bnb nested/uint8 form is an export concern
    of the module layer's ``QuantState.as_dict``).
    """
    from safetensors.numpy import save_file

    tensors: Dict[str, np.ndarray] = {}
    for name, leaf in _iter_qlinears(params):
        if isinstance(leaf, QLinear):
            tensors[name + ".weight.packed"] = np.asarray(leaf.wp)
            tensors[name + ".weight.absmax"] = np.asarray(leaf.scales)
        else:
            tensors[name] = np.asarray(
                leaf.astype(jnp.float32) if leaf.dtype == jnp.bfloat16
                else leaf)
    save_file(tensors, path)


def load_quantized(path: str, cfg: LlamaConfig) -> LlamaParams:
    """Inverse of :func:`save_quantized`."""
    from safetensors.numpy import load_file

    t = load_file(path)

    def get(name):
        if name + ".weight.packed" in t:
            return QLinear(
                wp=jnp.asarray(t[name + ".weight.packed"]),
                scales=jnp.asarray(t[name + ".weight.absmax"]),
            )
        return jnp.asarray(t[name]).astype(jnp.bfloat16)

    def get_opt(name):
        return get(name) if name in t else None

    layers = LlamaLayer(
        attn_norm=get("layers.attn_norm"),
        q=get("layers.q"), k=get("layers.k"), v=get("layers.v"),
        o=get("layers.o"),
        mlp_norm=get("layers.mlp_norm"),
        gate=get("layers.gate"), up=get("layers.up"), down=get("layers.down"),
        q_bias=get_opt("layers.q_bias"),
        k_bias=get_opt("layers.k_bias"),
        v_bias=get_opt("layers.v_bias"),
        post_attn_norm=get_opt("layers.post_attn_norm"),
        post_mlp_norm=get_opt("layers.post_mlp_norm"),
        q_norm=get_opt("layers.q_norm"),
        k_norm=get_opt("layers.k_norm"),
    )
    return LlamaParams(
        embed=get("embed"), layers=layers,
        final_norm=get("final_norm"), lm_head=get("lm_head"),
    )


# --------------------------------------------------------------------------
# bnb-format checkpoint EXPORT (the inverse of the load path above):
# write an HF-style directory whose quantized linears use the bnb
# flat-key serialization, consumable by HF+bitsandsbytes on GPU and by
# load_hf_llama here (which detects the keys and skips re-quantization).
# --------------------------------------------------------------------------

def config_to_hf(cfg: LlamaConfig, compress_statistics: bool = True,
                 ) -> Dict[str, Any]:
    """Inverse of :func:`config_from_hf`: an HF ``config.json`` dict
    that reconstructs ``cfg``'s family knobs (architecture name chosen
    so the loader's family detection fires)."""
    if cfg.qk_norm:
        arch, mt = "Qwen3ForCausalLM", "qwen3"
    elif cfg.post_norms:
        arch, mt = "Gemma2ForCausalLM", "gemma2"
    elif cfg.attention_bias:
        arch, mt = "Qwen2ForCausalLM", "qwen2"
    elif cfg.sliding_window is not None:
        arch, mt = "MistralForCausalLM", "mistral"
    else:
        arch, mt = "LlamaForCausalLM", "llama"
    hf: Dict[str, Any] = {
        "architectures": [arch],
        "model_type": mt,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "attention_bias": cfg.attention_bias,
        "torch_dtype": "bfloat16",
        "quantization_config": {
            "quant_method": "bitsandbytes",
            "load_in_4bit": True,
            "bnb_4bit_quant_type": cfg.quant.quant_type,
            "bnb_4bit_use_double_quant": compress_statistics,
            "bnb_4bit_compute_dtype": "bfloat16",
        },
    }
    if cfg.sliding_window is not None:
        hf["sliding_window"] = cfg.sliding_window
        hf["use_sliding_window"] = True
    if cfg.rope_scaling is not None:
        f, lo, hi, om = cfg.rope_scaling
        hf["rope_scaling"] = {
            "rope_type": "llama3", "factor": f, "low_freq_factor": lo,
            "high_freq_factor": hi,
            "original_max_position_embeddings": om,
        }
    if cfg.post_norms:   # Gemma-2 family block
        hf["attn_logit_softcapping"] = cfg.attn_logit_softcap
        hf["final_logit_softcapping"] = cfg.final_logit_softcap
        hf["query_pre_attn_scalar"] = cfg.query_scale
        first = ("sliding_attention" if cfg.sliding_layers == "even"
                 else "full_attention")
        other = ("full_attention" if first == "sliding_attention"
                 else "sliding_attention")
        hf["layer_types"] = [first if i % 2 == 0 else other
                             for i in range(cfg.num_hidden_layers)]
    return hf


def _bnb_payload(ql: QLinear, quant_type: str, compress: bool):
    """Runtime QLinear (pair/planar int32 words + RESOLVED fp32
    scales) -> (bnb packed uint8 [n/2, 1], QuantState) — the exact
    inverse of ``qlinear_arrays_from_bnb`` (double quantization
    re-encoded here, once)."""
    from ..ops.qmatmul import pair_to_planar
    from ..quant.codebooks import get_4bit_code
    from ..quant.functional import quantize_blockwise
    from ..quant.state import QuantState

    wp = ql.wp
    if ql.layout == "pair":
        wp = pair_to_planar(wp)
    M, K8 = wp.shape
    K = K8 * 8
    # little-endian int32 word view == the bnb flat byte stream
    # (inverse of ops/gemv.pack_i32_rows)
    b = np.ascontiguousarray(np.asarray(wp, np.int32)).view(np.uint8)
    packed = b.reshape(M * K // 2, 1)
    scales = ql.scales
    if ql.scales_packed:
        # bf16x2 storage: widen the merged row-pair words back to the
        # per-row float absmax the bnb schema stores (the exported
        # values are the runtime's actual bf16-rounded scales)
        from ..ops.qmatmul import unpack_scale_pairs

        scales = unpack_scale_pairs(scales)
    absmax = jnp.asarray(
        np.asarray(scales, np.float32).reshape(-1))
    code = jnp.asarray(get_4bit_code(quant_type))
    if compress:
        offset = jnp.mean(absmax)
        qabsmax, state2 = quantize_blockwise(absmax - offset,
                                             blocksize=256)
        state = QuantState(
            absmax=qabsmax, code=code, offset=offset, state2=state2,
            blocksize=64, quant_type=quant_type, dtype=jnp.bfloat16,
            shape=(M, K))
    else:
        state = QuantState(
            absmax=absmax, code=code, blocksize=64,
            quant_type=quant_type, dtype=jnp.bfloat16, shape=(M, K))
    return packed, state


def save_bnb_checkpoint(params: LlamaParams, cfg: LlamaConfig,
                        out_dir: str,
                        compress_statistics: bool = True) -> None:
    """Export quantized params as an HF directory in the bnb flat-key
    format (reference core.py:29-42 ``valid_qs_keys``): quantized
    linears keep their packed codes verbatim (byte-identical to what a
    bnb consumer stores), statistics are re-double-quantized when
    ``compress_statistics`` (bnb's default, slightly lossy on the
    scales) or written as fp32 absmax when not (exact round-trip).
    Embedding / lm_head / norms are written dense (fp32 — HF+bnb keeps
    them unquantized). ``load_hf_llama(out_dir)`` reloads the packed
    bytes drop-in.

    ``scales_dtype="bf16x2"`` models export their RUNTIME scales — the
    bf16-rounded values the kernels actually compute with — widened to
    fp32 absmax. Re-quantizing the same weights with fp32 scales and
    exporting yields different absmax bytes, so export round-trips are
    faithful to the model-as-served but not bit-stable across the
    scales_dtype knob (intentional; advisor r4)."""
    from safetensors.numpy import save_file

    from ..quant.bnb_io import bnb_flat_tensors

    qt = cfg.quant.quant_type
    tensors: Dict[str, np.ndarray] = {}

    def dense(x) -> np.ndarray:
        if isinstance(x, QLinear):
            from ..evals.parity import _dense_from_qlinear

            x = _dense_from_qlinear(x, qt)
        return np.asarray(jnp.asarray(x, jnp.float32))

    def put_q(prefix: str, ql: QLinear) -> None:
        packed, state = _bnb_payload(ql, qt, compress_statistics)
        tensors.update(bnb_flat_tensors(prefix, packed, state))

    lay = params.layers
    for i in range(cfg.num_hidden_layers):
        li = jax.tree.map(lambda a: a[i], lay)
        p = f"model.layers.{i}."
        put_q(p + "self_attn.q_proj", li.q)
        put_q(p + "self_attn.k_proj", li.k)
        put_q(p + "self_attn.v_proj", li.v)
        put_q(p + "self_attn.o_proj", li.o)
        put_q(p + "mlp.gate_proj", li.gate)
        put_q(p + "mlp.up_proj", li.up)
        put_q(p + "mlp.down_proj", li.down)
        tensors[p + "input_layernorm.weight"] = dense(li.attn_norm)
        if cfg.post_norms:
            tensors[p + "post_attention_layernorm.weight"] = dense(
                li.post_attn_norm)
            tensors[p + "pre_feedforward_layernorm.weight"] = dense(
                li.mlp_norm)
            tensors[p + "post_feedforward_layernorm.weight"] = dense(
                li.post_mlp_norm)
        else:
            tensors[p + "post_attention_layernorm.weight"] = dense(
                li.mlp_norm)
        if cfg.attention_bias:
            tensors[p + "self_attn.q_proj.bias"] = dense(li.q_bias)
            tensors[p + "self_attn.k_proj.bias"] = dense(li.k_bias)
            tensors[p + "self_attn.v_proj.bias"] = dense(li.v_bias)
        if cfg.qk_norm:
            tensors[p + "self_attn.q_norm.weight"] = dense(li.q_norm)
            tensors[p + "self_attn.k_norm.weight"] = dense(li.k_norm)

    tensors["model.embed_tokens.weight"] = dense(params.embed)
    tensors["model.norm.weight"] = dense(params.final_norm)
    if not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = dense(params.lm_head)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config_to_hf(cfg, compress_statistics), f, indent=1)
    save_file(tensors, os.path.join(out_dir, "model.safetensors"))
