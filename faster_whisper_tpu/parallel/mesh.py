"""Device meshes and sharding layouts for multi-chip serving.

The reference's entire parallelism story is request batching plus
multi-GPU round-robin model replicas (reference: faster_whisper/
transcribe.py:646-657, :1392-1394 and SURVEY §2.4) — there is no sharded
execution at all.  On TPU the idiomatic equivalent-and-better is a single
program over an ICI-connected mesh:

  * axis "data"  — batch-parallel: VAD chunks of the batched pipeline are
    split across chips (subsumes the reference's replica round-robin, with
    one weight copy per chip replaced by replicated params on the mesh).
  * axis "model" — tensor-parallel (Megatron layout): attention q/k/v and
    MLP up-projections are column-sharded, output/down-projections are
    row-sharded, so each layer needs exactly one all-reduce per sublayer,
    which XLA inserts from the sharding annotations.  Heads must divide
    the model-axis size.

Nothing here hand-schedules collectives: we annotate `NamedSharding`s on
params and batch inputs and let pjit/XLA do layout propagation, which is
the intended TPU programming model.
"""

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None:
        assert n_devices % model == 0, (n_devices, model)
        data = n_devices // model
    grid = np.array(devices).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def _attn_specs(tp: bool) -> dict:
    m = "model" if tp else None
    return {
        "wq": P(None, None, m),
        "bq": P(None, m),
        "wk": P(None, None, m),
        "wv": P(None, None, m),
        "bv": P(None, m),
        "wo": P(None, m, None),
        "bo": P(None),
    }


def _mlp_specs(tp: bool) -> dict:
    m = "model" if tp else None
    return {
        "w1": P(None, None, m),
        "b1": P(None, m),
        "w2": P(None, m, None),
        "b2": P(None),
    }


def param_pspecs(tensor_parallel: bool = True) -> dict:
    """PartitionSpec pytree matching models/load.py's param layout.

    Column-parallel: qkv + mlp.w1 (output dim over "model").
    Row-parallel: attention output + mlp.w2 (input dim over "model").
    Embeddings, conv stem, layernorms: replicated (they are tiny or feed
    full-width normalizations).
    """
    tp = tensor_parallel
    rep1 = P(None)
    rep2 = P(None, None)
    return {
        "encoder": {
            "conv1_w": P(None, None, None),
            "conv1_b": rep1,
            "conv2_w": P(None, None, None),
            "conv2_b": rep1,
            "pos_embed": rep2,
            "layers": {
                "ln1_g": rep2,
                "ln1_b": rep2,
                "attn": _attn_specs(tp),
                "ln2_g": rep2,
                "ln2_b": rep2,
                "mlp": _mlp_specs(tp),
            },
            "ln_post_g": rep1,
            "ln_post_b": rep1,
        },
        "decoder": {
            "token_embed": rep2,
            "pos_embed": rep2,
            "layers": {
                "ln1_g": rep2,
                "ln1_b": rep2,
                "self_attn": _attn_specs(tp),
                "ln2_g": rep2,
                "ln2_b": rep2,
                "cross_attn": _attn_specs(tp),
                "ln3_g": rep2,
                "ln3_b": rep2,
                "mlp": _mlp_specs(tp),
            },
            "ln_g": rep1,
            "ln_b": rep1,
        },
    }


def _scale_spec(w_spec: P) -> P:
    """Per-output-channel scale spec: the weight's spec minus its input
    (second-to-last) axis — q (..., in, out) pairs with s (..., out)."""
    entries = tuple(w_spec)
    return P(*(entries[: len(entries) - 2] + entries[len(entries) - 1 :]))


def specs_for_params(params, tensor_parallel: bool = True, model_size: int = 1):
    """Build a PartitionSpec tree matching an ACTUAL params tree.

    Unlike the static ``param_pspecs`` template, this walks the real tree:
    int8 trees carry QuantizedLinear leaves (q gets the weight's spec, s
    the output-axis part), the int8 logits head is vocab-column-sharded
    when the vocabulary divides the model axis (51866 = 2 x a prime, so
    only model=2 shards it; otherwise it replicates — 66 MB/chip), and
    any key the template does not know is replicated — so converted
    checkpoints with extra buffers shard safely."""
    from faster_whisper_tpu.ops.quant import QuantizedLinear

    template = param_pspecs(tensor_parallel)
    lw = params.get("decoder", {}).get("logits_w")
    shard_vocab = (
        tensor_parallel
        and lw is not None
        and model_size > 1
        and lw.q.shape[-1] % model_size == 0
    )
    template["decoder"]["logits_w"] = (
        P(None, "model") if shard_vocab else P(None, None)
    )

    def build(p, s):
        if isinstance(p, QuantizedLinear):
            if isinstance(s, P):
                return QuantizedLinear(s, _scale_spec(s))
            return QuantizedLinear(
                P(*([None] * p.q.ndim)), P(*([None] * p.s.ndim))
            )
        if isinstance(p, dict):
            return {
                k: build(v, s.get(k) if isinstance(s, dict) else None)
                for k, v in p.items()
            }
        if isinstance(s, P):
            return s
        return P(*([None] * np.ndim(p)))

    return build(params, template)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    """Place a param pytree onto the mesh with TP/replicated layouts."""
    specs = specs_for_params(
        params, tensor_parallel, model_size=mesh.shape.get("model", 1)
    )
    return jax.tree.map(
        lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
