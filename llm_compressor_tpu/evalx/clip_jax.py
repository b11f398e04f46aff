"""CLIP in JAX — the native backend for the T2I CLIPScore metric.

The reference computes CLIPScore through ``torchmetrics``' wrapper around
HF ``CLIPModel`` (reference evaluation/t2i_eval.py:246-262). This is the
TPU-native equivalent: the full dual-tower CLIP (ViT vision encoder + causal
text encoder, quick-GELU, projection heads) as pure functions over a params
pytree, jitted for the chip, with weights mapped from the standard HF
``CLIPModel`` state dict. Parity vs ``transformers.CLIPModel`` is tested at
tiny config in tests/test_t2i_metrics.py — no checkpoint download needed.

Score semantics match torchmetrics.functional.multimodal.clip_score:
    score(img, prompt) = max(0, 100 * cos(image_embed, text_embed))
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# HF CLIPProcessor normalization constants (openai/clip-vit-*).
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class ClipTowerConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


@dataclass(frozen=True)
class ClipConfig:
    vision: ClipTowerConfig
    text: ClipTowerConfig
    image_size: int = 224
    patch_size: int = 16
    text_vocab: int = 49408
    text_max_pos: int = 77
    projection_dim: int = 512


def clip_config_from_hf(hf) -> ClipConfig:
    """Build from a ``transformers.CLIPConfig`` (or dict with vision_config /
    text_config)."""
    v, t = hf.vision_config, hf.text_config
    return ClipConfig(
        vision=ClipTowerConfig(v.hidden_size, v.intermediate_size,
                               v.num_hidden_layers, v.num_attention_heads,
                               v.layer_norm_eps, v.hidden_act),
        text=ClipTowerConfig(t.hidden_size, t.intermediate_size,
                             t.num_hidden_layers, t.num_attention_heads,
                             t.layer_norm_eps, t.hidden_act),
        image_size=v.image_size, patch_size=v.patch_size,
        text_vocab=t.vocab_size, text_max_pos=t.max_position_embeddings,
        projection_dim=hf.projection_dim,
    )


def load_clip_params(sd: Dict[str, np.ndarray], cfg: ClipConfig) -> dict:
    """Map the flat HF ``CLIPModel`` state dict into the params pytree.
    Linear weights stay (out, in), matching the rest of this framework."""
    g = lambda k: jnp.asarray(np.asarray(sd[k]), jnp.float32)  # noqa: E731

    def lin(prefix):
        d = {"weight": g(prefix + ".weight")}
        if prefix + ".bias" in sd:
            d["bias"] = g(prefix + ".bias")
        return d

    def tower(prefix, n_layers):
        layers = []
        for i in range(n_layers):
            p = f"{prefix}.encoder.layers.{i}"
            layers.append({
                "ln1": lin(p + ".layer_norm1"),
                "ln2": lin(p + ".layer_norm2"),
                "q": lin(p + ".self_attn.q_proj"),
                "k": lin(p + ".self_attn.k_proj"),
                "v": lin(p + ".self_attn.v_proj"),
                "o": lin(p + ".self_attn.out_proj"),
                "fc1": lin(p + ".mlp.fc1"),
                "fc2": lin(p + ".mlp.fc2"),
            })
        return layers

    return {
        "vision": {
            "class_embedding": g("vision_model.embeddings.class_embedding"),
            "patch_embedding": g("vision_model.embeddings.patch_embedding.weight"),
            "position_embedding": g("vision_model.embeddings.position_embedding.weight"),
            "pre_ln": lin("vision_model.pre_layrnorm"),  # (sic — HF key)
            "layers": tower("vision_model", cfg.vision.num_layers),
            "post_ln": lin("vision_model.post_layernorm"),
            "projection": lin("visual_projection"),
        },
        "text": {
            "token_embedding": g("text_model.embeddings.token_embedding.weight"),
            "position_embedding": g("text_model.embeddings.position_embedding.weight"),
            "layers": tower("text_model", cfg.text.num_layers),
            "final_ln": lin("text_model.final_layer_norm"),
            "projection": lin("text_projection"),
        },
    }


def _ln(x, p, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["weight"] + p["bias"]


def _linear(x, p):
    y = x @ p["weight"].T
    return y + p["bias"] if "bias" in p else y


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _encoder(layers, tc: ClipTowerConfig, x, mask=None):
    """Pre-LN transformer encoder shared by both towers. ``mask`` is an
    additive (1|B, 1, T, T) float mask (text tower: causal + padding)."""
    B, T, E = x.shape
    H = tc.num_heads
    D = E // H
    scale = D ** -0.5
    for lp in layers:
        h = _ln(x, lp["ln1"], tc.layer_norm_eps)
        q = _linear(h, lp["q"]).reshape(B, T, H, D) * scale
        k = _linear(h, lp["k"]).reshape(B, T, H, D)
        v = _linear(h, lp["v"]).reshape(B, T, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, E)
        x = x + _linear(o, lp["o"])
        h = _ln(x, lp["ln2"], tc.layer_norm_eps)
        x = x + _linear(_act(_linear(h, lp["fc1"]), tc.hidden_act), lp["fc2"])
    return x


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params, pixel_values, *, cfg: ClipConfig):
    """pixel_values (B, 3, H, W) normalized float -> image embeds (B, P),
    L2-normalized."""
    vp = params["vision"]
    tc = cfg.vision
    B = pixel_values.shape[0]
    p = cfg.patch_size
    gh = cfg.image_size // p
    # patchify + project == the stride-p conv (weight (E, 3, p, p))
    x = pixel_values.reshape(B, 3, gh, p, gh, p).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, gh * gh, 3 * p * p)
    w = vp["patch_embedding"].reshape(tc.hidden_size, 3 * p * p)
    x = x @ w.T
    cls = jnp.broadcast_to(vp["class_embedding"], (B, 1, tc.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + vp["position_embedding"][None]
    x = _ln(x, vp["pre_ln"], tc.layer_norm_eps)
    x = _encoder(vp["layers"], tc, x)
    pooled = _ln(x[:, 0], vp["post_ln"], tc.layer_norm_eps)
    emb = _linear(pooled, vp["projection"])
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("cfg",))
def encode_text(params, input_ids, eot_idx, *, cfg: ClipConfig):
    """input_ids (B, T) int32, eot_idx (B,) position of the EOS token per
    row -> text embeds (B, P), L2-normalized."""
    tp = params["text"]
    tc = cfg.text
    B, T = input_ids.shape
    x = tp["token_embedding"][input_ids] + tp["position_embedding"][None, :T]
    causal = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -jnp.inf)
    x = _encoder(tp["layers"], tc, x, mask=causal[None, None])
    x = _ln(x, tp["final_ln"], tc.layer_norm_eps)
    pooled = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    emb = _linear(pooled, tp["projection"])
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def preprocess_images(images, image_size: int = 224) -> np.ndarray:
    """uint8 (H, W, 3) images -> (B, 3, S, S) normalized float32, matching
    HF CLIPProcessor: bicubic resize of the short side + center crop +
    mean/std normalize."""
    from PIL import Image

    out = []
    for im in images:
        img = Image.fromarray(np.asarray(im, np.uint8))
        w, h = img.size
        short = min(w, h)
        nw, nh = round(w * image_size / short), round(h * image_size / short)
        img = img.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - image_size) // 2, (nh - image_size) // 2
        img = img.crop((left, top, left + image_size, top + image_size))
        a = np.asarray(img, np.float32) / 255.0
        a = (a - IMAGE_MEAN) / IMAGE_STD
        out.append(a.transpose(2, 0, 1))
    return np.stack(out)


def clip_scores(params, cfg: ClipConfig, pixel_values, input_ids,
                eot_idx) -> np.ndarray:
    """Per-pair CLIPScore: max(0, 100 * cos(image_embed, text_embed)) —
    torchmetrics semantics."""
    ie = encode_image(params, jnp.asarray(pixel_values), cfg=cfg)
    te = encode_text(params, jnp.asarray(input_ids),
                     jnp.asarray(eot_idx, jnp.int32), cfg=cfg)
    return np.asarray(jnp.maximum(jnp.sum(ie * te, axis=-1) * 100.0, 0.0))


class ClipScorer:
    """Load a local HF CLIP checkpoint directory (zero-egress: no hub
    downloads) and score (image, prompt) pairs on the accelerator."""

    def __init__(self, clip_path: str):
        import transformers

        hf_cfg = transformers.CLIPConfig.from_pretrained(clip_path)
        self.cfg = clip_config_from_hf(hf_cfg)
        model = transformers.CLIPModel.from_pretrained(clip_path)
        sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
        self.params = load_clip_params(sd, self.cfg)
        self.tokenizer = transformers.AutoTokenizer.from_pretrained(clip_path)

    def score(self, images, prompts) -> np.ndarray:
        px = preprocess_images(images, self.cfg.image_size)
        enc = self.tokenizer(list(prompts), padding="max_length",
                             max_length=self.cfg.text_max_pos,
                             truncation=True, return_tensors="np")
        ids = enc["input_ids"].astype(np.int32)
        eot = (ids == self.tokenizer.eos_token_id).argmax(axis=-1)
        return clip_scores(self.params, self.cfg, px, ids, eot)
