"""Decoder-step component variants: where do 455 us/layer go?

The full step measures ~14.6 ms at bench shapes vs a ~3.3 ms HBM floor.
Each variant removes one component from the per-layer body; the delta
from FULL attributes the cost.  All loops run STEPS iterations inside
one jit (launch overhead ~2 ms is amortized out).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_whisper_tpu.generation.generate import _expand_caches
from faster_whisper_tpu.models.config import CONFIGS
from faster_whisper_tpu.models.load import random_params_device
from faster_whisper_tpu.models.model import (
    _dense,
    _mlp,
    decoder_prefill,
    layer_norm,
)
from faster_whisper_tpu.ops.quant import QuantKV, quantize_kv, quantize_params

B, K, P, CTX, STEPS = 8, 5, 32, 192, 128
MODEL = os.environ.get("PROF_MODEL", "large-v3")
NEG_INF = jnp.float32(-1e30)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def build_step(config, enable):
    """enable: set of {"self", "selfwrite", "cross", "mlp", "logits"}."""
    n_head = config.n_text_head
    dh = config.n_text_state // n_head
    L = config.n_text_layer

    def step_loop(params, self_k, self_v, cross_k, cross_v, anc):
        dec = params["decoder"]
        dtype = dec["token_embed"].dtype
        b_idx = jnp.arange(B)[:, None]
        k_idx = jnp.arange(K)[None, :]
        scale = dh ** -0.5

        def take(w, i):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), w
            )

        layers = dec["layers"]

        def one_step(s, carry):
            self_k, self_v, acc = carry
            token = jnp.full((B, K), 100, jnp.int32)
            pos = jnp.full((B, K), 4, jnp.int32) + s
            allow = jnp.arange(CTX)[None, None, :] <= pos[:, :, None]
            sel = anc[:, :, None, :] == jnp.arange(K)[None, None, :, None]
            allow_j = sel & allow[:, :, None, :]
            x = (dec["token_embed"][token] + dec["pos_embed"][pos]).astype(dtype)

            def body(i, carry):
                x, self_k, self_v = carry
                p = take(layers, i)
                if "self" in enable:
                    h = layer_norm(x, p["ln1_g"], p["ln1_b"])
                    sa = p["self_attn"]
                    q = _dense(h, sa["wq"], sa["bq"]).reshape(B, K, n_head, dh)
                    k_new = _dense(h, sa["wk"]).reshape(B, K, n_head, dh)
                    v_new = _dense(h, sa["wv"], sa["bv"]).reshape(B, K, n_head, dh)
                    if "selfwrite" in enable:
                        kq, vq = quantize_kv(k_new), quantize_kv(v_new)
                        self_k = QuantKV(
                            self_k.q.at[i, b_idx, k_idx, pos].set(kq.q),
                            self_k.s.at[i, b_idx, k_idx, pos].set(kq.s),
                        )
                        self_v = QuantKV(
                            self_v.q.at[i, b_idx, k_idx, pos].set(vq.q),
                            self_v.s.at[i, b_idx, k_idx, pos].set(vq.s),
                        )
                    elif "slicewrite" in enable:
                        # update the 9.8 MB layer slice, DUS it back at i
                        kq, vq = quantize_kv(k_new), quantize_kv(v_new)
                        bk = jnp.arange(B)[:, None]
                        kk = jnp.arange(K)[None, :]
                        skq = jax.lax.dynamic_index_in_dim(self_k.q, i, 0, False)
                        sks_ = jax.lax.dynamic_index_in_dim(self_k.s, i, 0, False)
                        svq = jax.lax.dynamic_index_in_dim(self_v.q, i, 0, False)
                        svs_ = jax.lax.dynamic_index_in_dim(self_v.s, i, 0, False)
                        skq = skq.at[bk, kk, pos].set(kq.q)
                        sks_ = sks_.at[bk, kk, pos].set(kq.s)
                        svq = svq.at[bk, kk, pos].set(vq.q)
                        svs_ = svs_.at[bk, kk, pos].set(vq.s)
                        self_k = QuantKV(
                            jax.lax.dynamic_update_slice_in_dim(
                                self_k.q, skq[None], i, 0),
                            jax.lax.dynamic_update_slice_in_dim(
                                self_k.s, sks_[None], i, 0),
                        )
                        self_v = QuantKV(
                            jax.lax.dynamic_update_slice_in_dim(
                                self_v.q, svq[None], i, 0),
                            jax.lax.dynamic_update_slice_in_dim(
                                self_v.s, svs_[None], i, 0),
                        )
                    elif "duswrite" in enable:
                        # uniform-slot write: every row writes cache slot
                        # 4+s (legal once prompts are right-aligned)
                        kq, vq = quantize_kv(k_new), quantize_kv(v_new)
                        slot = 4 + s
                        self_k = QuantKV(
                            jax.lax.dynamic_update_slice(
                                self_k.q, kq.q[None, :, :, None],
                                (i, 0, 0, slot, 0, 0)),
                            jax.lax.dynamic_update_slice(
                                self_k.s, kq.s[None, :, :, None],
                                (i, 0, 0, slot, 0)),
                        )
                        self_v = QuantKV(
                            jax.lax.dynamic_update_slice(
                                self_v.q, vq.q[None, :, :, None],
                                (i, 0, 0, slot, 0, 0)),
                            jax.lax.dynamic_update_slice(
                                self_v.s, vq.s[None, :, :, None],
                                (i, 0, 0, slot, 0)),
                        )
                    sk = jax.lax.dynamic_index_in_dim(self_k.q, i, 0, keepdims=False)
                    sv = jax.lax.dynamic_index_in_dim(self_v.q, i, 0, keepdims=False)
                    sks = jax.lax.dynamic_index_in_dim(self_k.s, i, 0, keepdims=False)
                    svs = jax.lax.dynamic_index_in_dim(self_v.s, i, 0, keepdims=False)
                    sk, sv = sk.astype(dtype), sv.astype(dtype)
                    scores = jnp.einsum(
                        "bkhd,bjchd->bkhjc", q, sk,
                        preferred_element_type=jnp.float32,
                    ) * scale
                    scores = scores * sks.transpose(0, 3, 1, 2)[:, None]
                    scores = jnp.where(allow_j[:, :, None, :, :], scores, NEG_INF)
                    w = jax.nn.softmax(
                        scores.reshape(B, K, n_head, K * CTX), axis=-1
                    ).reshape(B, K, n_head, K, CTX)
                    w = (w * svs.transpose(0, 3, 1, 2)[:, None]).astype(dtype)
                    attn = jnp.einsum("bkhjc,bjchd->bkhd", w, sv).reshape(B, K, -1)
                    x = x + _dense(attn, sa["wo"], sa["bo"])

                if "cross" in enable:
                    h = layer_norm(x, p["ln2_g"], p["ln2_b"])
                    cp = p["cross_attn"]
                    qx = _dense(h, cp["wq"], cp["bq"]).reshape(B, K, n_head, dh)
                    ck = jax.lax.dynamic_index_in_dim(cross_k.q, i, 0, keepdims=False)
                    cv = jax.lax.dynamic_index_in_dim(cross_v.q, i, 0, keepdims=False)
                    cks = jax.lax.dynamic_index_in_dim(cross_k.s, i, 0, keepdims=False)
                    cvs = jax.lax.dynamic_index_in_dim(cross_v.s, i, 0, keepdims=False)
                    ck, cv = ck.astype(dtype), cv.astype(dtype)
                    scores = jnp.einsum(
                        "bkhd,bthd->bkht", qx, ck,
                        preferred_element_type=jnp.float32,
                    ) * scale
                    scores = scores * cks.transpose(0, 2, 1)[:, None]
                    w = jax.nn.softmax(scores, axis=-1)
                    w = (w * cvs.transpose(0, 2, 1)[:, None]).astype(dtype)
                    attn = jnp.einsum("bkht,bthd->bkhd", w, cv).reshape(B, K, -1)
                    x = x + _dense(attn, cp["wo"], cp["bo"])

                if "mlp" in enable:
                    h = layer_norm(x, p["ln3_g"], p["ln3_b"])
                    x = x + _mlp(p["mlp"], h)
                return x, self_k, self_v

            x, self_k, self_v = jax.lax.fori_loop(
                0, L, body, (x, self_k, self_v)
            )
            if "logits" in enable:
                x = layer_norm(x, dec["ln_g"], dec["ln_b"])
                logits = jnp.dot(
                    x, dec["token_embed"].T, preferred_element_type=jnp.float32
                )
                acc = acc + jnp.sum(logits[:, 0, :8])
            else:
                acc = acc + jnp.sum(x[:, 0, :8].astype(jnp.float32))
            return self_k, self_v, acc

        def outer(s, carry):
            return one_step(s, carry)

        _, _, acc = jax.lax.fori_loop(
            0, STEPS, outer, (self_k, self_v, jnp.float32(0))
        )
        return acc

    return jax.jit(step_loop)


def build_step_deferred(config):
    """Deferred-write step: the big caches stay read-only through the layer
    loop (each layer stacks its new K/V into a small (L,B,K,H,D) buffer and
    attends the current token via an explicit extra slot); one DUS per cache
    tensor flushes the step's K/V at a uniform slot."""
    n_head = config.n_text_head
    dh = config.n_text_state // n_head
    L = config.n_text_layer

    def step_loop(params, self_k, self_v, cross_k, cross_v, anc):
        dec = params["decoder"]
        dtype = dec["token_embed"].dtype
        scale = dh ** -0.5

        def take(w, i):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), w
            )

        layers = dec["layers"]

        def one_step(s, carry):
            self_k, self_v, acc = carry
            token = jnp.full((B, K), 100, jnp.int32)
            pos = jnp.full((B, K), 4, jnp.int32) + s
            # cache holds K/V only up to the previous step: strict <
            allow = jnp.arange(CTX)[None, None, :] < pos[:, :, None]
            sel = anc[:, :, None, :] == jnp.arange(K)[None, None, :, None]
            allow_j = sel & allow[:, :, None, :]
            x = (dec["token_embed"][token] + dec["pos_embed"][pos]).astype(dtype)

            newk_q = jnp.zeros((L, B, K, n_head, dh), jnp.int8)
            newk_s = jnp.zeros((L, B, K, n_head), jnp.float32)
            newv_q = jnp.zeros((L, B, K, n_head, dh), jnp.int8)
            newv_s = jnp.zeros((L, B, K, n_head), jnp.float32)

            def body(i, carry):
                x, newk_q, newk_s, newv_q, newv_s = carry
                p = take(layers, i)
                h = layer_norm(x, p["ln1_g"], p["ln1_b"])
                sa = p["self_attn"]
                q = _dense(h, sa["wq"], sa["bq"]).reshape(B, K, n_head, dh)
                k_new = _dense(h, sa["wk"]).reshape(B, K, n_head, dh)
                v_new = _dense(h, sa["wv"], sa["bv"]).reshape(B, K, n_head, dh)
                kq, vq = quantize_kv(k_new), quantize_kv(v_new)
                newk_q = jax.lax.dynamic_update_slice_in_dim(
                    newk_q, kq.q[None], i, 0)
                newk_s = jax.lax.dynamic_update_slice_in_dim(
                    newk_s, kq.s[None], i, 0)
                newv_q = jax.lax.dynamic_update_slice_in_dim(
                    newv_q, vq.q[None], i, 0)
                newv_s = jax.lax.dynamic_update_slice_in_dim(
                    newv_s, vq.s[None], i, 0)

                sk = jax.lax.dynamic_index_in_dim(self_k.q, i, 0, keepdims=False)
                sv = jax.lax.dynamic_index_in_dim(self_v.q, i, 0, keepdims=False)
                sks = jax.lax.dynamic_index_in_dim(self_k.s, i, 0, keepdims=False)
                svs = jax.lax.dynamic_index_in_dim(self_v.s, i, 0, keepdims=False)
                sk, sv = sk.astype(dtype), sv.astype(dtype)
                scores = jnp.einsum(
                    "bkhd,bjchd->bkhjc", q, sk,
                    preferred_element_type=jnp.float32,
                ) * scale
                scores = scores * sks.transpose(0, 3, 1, 2)[:, None]
                scores = jnp.where(allow_j[:, :, None, :, :], scores, NEG_INF)
                # extra slot: the current token attends its own new K/V
                own = jnp.einsum(
                    "bkhd,bkhd->bkh", q, k_new,
                    preferred_element_type=jnp.float32,
                ) * scale
                flat = jnp.concatenate(
                    [scores.reshape(B, K, n_head, K * CTX), own[..., None]],
                    axis=-1,
                )
                w = jax.nn.softmax(flat, axis=-1)
                w_cache = w[..., :-1].reshape(B, K, n_head, K, CTX)
                w_own = w[..., -1]
                w_cache = (
                    w_cache * svs.transpose(0, 3, 1, 2)[:, None]
                ).astype(dtype)
                attn = jnp.einsum("bkhjc,bjchd->bkhd", w_cache, sv)
                attn = attn + w_own[..., None].astype(dtype) * v_new
                x = x + _dense(attn.reshape(B, K, -1), sa["wo"], sa["bo"])

                h = layer_norm(x, p["ln2_g"], p["ln2_b"])
                cp = p["cross_attn"]
                qx = _dense(h, cp["wq"], cp["bq"]).reshape(B, K, n_head, dh)
                ck = jax.lax.dynamic_index_in_dim(cross_k.q, i, 0, keepdims=False)
                cv = jax.lax.dynamic_index_in_dim(cross_v.q, i, 0, keepdims=False)
                cks = jax.lax.dynamic_index_in_dim(cross_k.s, i, 0, keepdims=False)
                cvs = jax.lax.dynamic_index_in_dim(cross_v.s, i, 0, keepdims=False)
                ck, cv = ck.astype(dtype), cv.astype(dtype)
                scores = jnp.einsum(
                    "bkhd,bthd->bkht", qx, ck,
                    preferred_element_type=jnp.float32,
                ) * scale
                scores = scores * cks.transpose(0, 2, 1)[:, None]
                w = jax.nn.softmax(scores, axis=-1)
                w = (w * cvs.transpose(0, 2, 1)[:, None]).astype(dtype)
                attn = jnp.einsum("bkht,bthd->bkhd", w, cv).reshape(B, K, -1)
                x = x + _dense(attn, cp["wo"], cp["bo"])

                h = layer_norm(x, p["ln3_g"], p["ln3_b"])
                x = x + _mlp(p["mlp"], h)
                return x, newk_q, newk_s, newv_q, newv_s

            x, newk_q, newk_s, newv_q, newv_s = jax.lax.fori_loop(
                0, L, body, (x, newk_q, newk_s, newv_q, newv_s)
            )
            # flush the step's K/V at the uniform slot 4+s
            slot = 4 + s
            self_k = QuantKV(
                jax.lax.dynamic_update_slice(
                    self_k.q, newk_q[:, :, :, None], (0, 0, 0, slot, 0, 0)),
                jax.lax.dynamic_update_slice(
                    self_k.s, newk_s[:, :, :, None], (0, 0, 0, slot, 0)),
            )
            self_v = QuantKV(
                jax.lax.dynamic_update_slice(
                    self_v.q, newv_q[:, :, :, None], (0, 0, 0, slot, 0, 0)),
                jax.lax.dynamic_update_slice(
                    self_v.s, newv_s[:, :, :, None], (0, 0, 0, slot, 0)),
            )
            x = layer_norm(x, dec["ln_g"], dec["ln_b"])
            logits = jnp.dot(
                x, dec["token_embed"].T, preferred_element_type=jnp.float32
            )
            acc = acc + jnp.sum(logits[:, 0, :8])
            return self_k, self_v, acc

        _, _, acc = jax.lax.fori_loop(
            0, STEPS, one_step, (self_k, self_v, jnp.float32(0))
        )
        return acc

    return jax.jit(step_loop)


def main():
    config = CONFIGS[MODEL]
    params = random_params_device(config, seed=0, dtype="bfloat16")
    params = quantize_params(params)

    rng = np.random.default_rng(0)
    xa = jnp.asarray(
        rng.standard_normal((B, 1500, config.n_text_state)), jnp.bfloat16
    )
    prompt = jnp.zeros((B, P), jnp.int32)
    plen = jnp.full((B,), 4, jnp.int32)
    gather = jnp.stack([plen - 1, jnp.zeros_like(plen)], axis=1)
    _, cache0 = decoder_prefill(params, config, prompt, plen, xa, gather, ctx=CTX)
    self_k, self_v, cross_k, cross_v = _expand_caches(cache0, K, True)
    anc = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, CTX)
    )

    variants = [
        ("FULL", {"self", "selfwrite", "cross", "mlp", "logits"}),
        ("no-selfwrite", {"self", "cross", "mlp", "logits"}),
        ("no-self", {"cross", "mlp", "logits"}),
        ("no-cross", {"self", "selfwrite", "mlp", "logits"}),
        ("mlp-only", {"mlp", "logits"}),
    ]
    for name, enable in variants:
        fn = build_step(config, enable)
        t = timeit(fn, params, self_k, self_v, cross_k, cross_v, anc)
        print(f"{name:14s}: {t*1e3:7.1f} ms -> {t/STEPS*1e3:6.2f} ms/step",
              flush=True)
    fn = build_step_deferred(config)
    t = timeit(fn, params, self_k, self_v, cross_k, cross_v, anc)
    print(f"{'FULL-deferred':14s}: {t*1e3:7.1f} ms -> {t/STEPS*1e3:6.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
