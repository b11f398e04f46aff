"""ImageReward in JAX — the native backend for the T2I ImageReward metric.

The reference scores images through the ``ImageReward`` pip package
(reference evaluation/t2i_eval.py:196-244): BLIP backbone (ViT vision
encoder + a BERT text encoder whose every layer cross-attends to the image
tokens) followed by a 5-linear MLP reward head, with the published
normalization constants. This is that model as pure JAX functions over a
params pytree, jitted for the chip. Parity of every tower is tested against
``transformers``' ``BlipVisionModel`` / ``BlipTextModel`` (HF's port of the
same salesforce BLIP code the package uses) at tiny config in
tests/test_t2i_metrics.py.

    reward(prompt, image) = (mlp(text_enc(prompt | image_tokens)[:, 0])
                             - MEAN) / STD
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# Published ImageReward-v1.0 normalization (ImageReward/ImageReward.py).
REWARD_MEAN = 0.16717362830052426
REWARD_STD = 1.0333394966054072


@dataclass(frozen=True)
class BlipConfig:
    # vision tower (ViT, pre-LN, fused qkv)
    v_hidden: int = 1024
    v_inter: int = 4096
    v_layers: int = 24
    v_heads: int = 16
    image_size: int = 224
    patch_size: int = 16
    # text tower (BERT post-LN + per-layer cross-attention)
    t_hidden: int = 768
    t_inter: int = 3072
    t_layers: int = 12
    t_heads: int = 12
    t_vocab: int = 30524
    t_max_pos: int = 512
    eps: float = 1e-12
    v_eps: float = 1e-5


def _ln(x, p, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["weight"] + p["bias"]


def _linear(x, p):
    y = x @ p["weight"].T
    return y + p["bias"] if "bias" in p else y


def _mha(q, k, v, heads, mask=None):
    """(B, Tq/Tk, E) projections -> (B, Tq, E); BERT/ViT softmax attention."""
    B, Tq, E = q.shape
    Tk = k.shape[1]
    D = E // heads
    q = q.reshape(B, Tq, heads, D)
    k = k.reshape(B, Tk, heads, D)
    v = v.reshape(B, Tk, heads, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(D))
    if mask is not None:
        s = s + mask
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, Tq, E)


@partial(jax.jit, static_argnames=("cfg",))
def encode_image_blip(params, pixel_values, *, cfg: BlipConfig):
    """(B, 3, S, S) normalized float -> all image tokens (B, N+1, v_hidden)
    after the final LayerNorm (what BLIP's visual_encoder returns and the
    text tower cross-attends to)."""
    vp = params["vision"]
    B = pixel_values.shape[0]
    p = cfg.patch_size
    gh = cfg.image_size // p
    x = pixel_values.reshape(B, 3, gh, p, gh, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, gh * gh, 3 * p * p)
    x = x @ vp["patch_embedding"]["weight"].reshape(cfg.v_hidden, -1).T
    x = x + vp["patch_embedding"]["bias"]
    cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, cfg.v_hidden))
    x = jnp.concatenate([cls, x], axis=1) + vp["position_embedding"][None]
    for lp in vp["layers"]:
        h = _ln(x, lp["ln1"], cfg.v_eps)
        qkv = _linear(h, lp["qkv"]).reshape(*h.shape[:2], 3, cfg.v_hidden)
        a = _mha(qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :], cfg.v_heads)
        x = x + _linear(a, lp["proj"])
        h = _ln(x, lp["ln2"], cfg.v_eps)
        x = x + _linear(jax.nn.gelu(_linear(h, lp["fc1"]), approximate=False),
                        lp["fc2"])
    return _ln(x, vp["post_ln"], cfg.v_eps)


@partial(jax.jit, static_argnames=("cfg",))
def encode_text_blip(params, input_ids, attention_mask, image_embeds,
                     *, cfg: BlipConfig):
    """BERT post-LN text encoder; every layer: self-attn (bidirectional,
    padding-masked) -> cross-attn over ``image_embeds`` -> FFN, each with
    residual + LayerNorm (salesforce med.py via HF BlipTextModel).
    Returns last_hidden_state (B, T, t_hidden)."""
    tp = params["text"]
    B, T = input_ids.shape
    x = (tp["word_embeddings"][input_ids]
         + tp["position_embeddings"][None, :T])
    x = _ln(x, tp["embed_ln"], cfg.eps)
    pad = (1.0 - attention_mask.astype(jnp.float32)) * -1e9  # (B, T)
    pad = pad[:, None, None, :]                              # (B, 1, 1, T)
    for lp in tp["layers"]:
        a = _mha(_linear(x, lp["q"]), _linear(x, lp["k"]),
                 _linear(x, lp["v"]), cfg.t_heads, mask=pad)
        x = _ln(x + _linear(a, lp["attn_out"]), lp["attn_ln"], cfg.eps)
        c = _mha(_linear(x, lp["xq"]), _linear(image_embeds, lp["xk"]),
                 _linear(image_embeds, lp["xv"]), cfg.t_heads)
        x = _ln(x + _linear(c, lp["cross_out"]), lp["cross_ln"], cfg.eps)
        f = _linear(jax.nn.gelu(_linear(x, lp["fc1"]), approximate=False),
                    lp["fc2"])
        x = _ln(x + f, lp["ffn_ln"], cfg.eps)
    return x


@partial(jax.jit, static_argnames=("cfg",))
def reward_scores(params, pixel_values, input_ids, attention_mask,
                  *, cfg: BlipConfig):
    """Raw-then-normalized ImageReward: (B,) float32."""
    img = encode_image_blip(params, pixel_values, cfg=cfg)
    txt = encode_text_blip(params, input_ids, attention_mask, img, cfg=cfg)
    h = txt[:, 0]
    for i, lp in enumerate(params["mlp"]):
        h = _linear(h, lp)
    return (h[:, 0] - REWARD_MEAN) / REWARD_STD


def load_image_reward_params(sd: Dict[str, np.ndarray],
                             cfg: BlipConfig) -> dict:
    """Map an ImageReward-v1.0 checkpoint state dict (timm-style
    ``blip.visual_encoder.*`` + med-BERT ``blip.text_encoder.*`` +
    ``mlp.layers.*``) into the params pytree."""
    g = lambda k: jnp.asarray(np.asarray(sd[k]), jnp.float32)  # noqa: E731

    def lin(prefix):
        d = {"weight": g(prefix + ".weight")}
        if prefix + ".bias" in sd:
            d["bias"] = g(prefix + ".bias")
        return d

    v_layers = []
    i = 0
    while f"blip.visual_encoder.blocks.{i}.norm1.weight" in sd:
        p = f"blip.visual_encoder.blocks.{i}"
        v_layers.append({
            "ln1": lin(p + ".norm1"), "ln2": lin(p + ".norm2"),
            "qkv": lin(p + ".attn.qkv"), "proj": lin(p + ".attn.proj"),
            "fc1": lin(p + ".mlp.fc1"), "fc2": lin(p + ".mlp.fc2"),
        })
        i += 1

    t_layers = []
    i = 0
    while f"blip.text_encoder.encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"blip.text_encoder.encoder.layer.{i}"
        t_layers.append({
            "q": lin(p + ".attention.self.query"),
            "k": lin(p + ".attention.self.key"),
            "v": lin(p + ".attention.self.value"),
            "attn_out": lin(p + ".attention.output.dense"),
            "attn_ln": lin(p + ".attention.output.LayerNorm"),
            "xq": lin(p + ".crossattention.self.query"),
            "xk": lin(p + ".crossattention.self.key"),
            "xv": lin(p + ".crossattention.self.value"),
            "cross_out": lin(p + ".crossattention.output.dense"),
            "cross_ln": lin(p + ".crossattention.output.LayerNorm"),
            "fc1": lin(p + ".intermediate.dense"),
            "fc2": lin(p + ".output.dense"),
            "ffn_ln": lin(p + ".output.LayerNorm"),
        })
        i += 1

    mlp_idx = sorted({int(k.split(".")[2]) for k in sd
                      if k.startswith("mlp.layers.") and k.endswith(".weight")})
    return {
        "vision": {
            "class_embedding": g("blip.visual_encoder.cls_token").reshape(1, -1),
            "position_embedding": g("blip.visual_encoder.pos_embed")[0],
            "patch_embedding": lin("blip.visual_encoder.patch_embed.proj"),
            "layers": v_layers,
            "post_ln": lin("blip.visual_encoder.norm"),
        },
        "text": {
            "word_embeddings": g("blip.text_encoder.embeddings.word_embeddings.weight"),
            "position_embeddings": g("blip.text_encoder.embeddings.position_embeddings.weight"),
            "embed_ln": lin("blip.text_encoder.embeddings.LayerNorm"),
            "layers": t_layers,
        },
        "mlp": [lin(f"mlp.layers.{i}") for i in mlp_idx],
    }


class ImageRewardScorer:
    """Load a local ImageReward checkpoint (``.pt`` state dict + a local
    BERT tokenizer directory; zero-egress, no hub downloads) and score
    (image, prompt) pairs on the accelerator."""

    def __init__(self, checkpoint_path: str, tokenizer_path: str,
                 cfg: BlipConfig = BlipConfig()):
        import torch
        import transformers

        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        self.cfg = cfg
        self.params = load_image_reward_params(sd, cfg)
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(
            tokenizer_path)

    def score(self, images, prompts) -> np.ndarray:
        from .clip_jax import preprocess_images

        px = preprocess_images(images, self.cfg.image_size)
        enc = self.tokenizer(list(prompts), padding="max_length",
                             max_length=35, truncation=True,
                             return_tensors="np")
        return np.asarray(reward_scores(
            self.params, jnp.asarray(px),
            jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"], jnp.int32), cfg=self.cfg))
