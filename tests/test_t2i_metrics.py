"""Parity tests for the native T2I metric backends (CLIPScore, ImageReward)
vs their torch reference implementations at tiny random config — the same
oracle pattern as test_hf_parity.py (reference evaluation/t2i_eval.py wraps
these torch models via torchmetrics / the ImageReward package)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


def _tiny_clip():
    return transformers.CLIPConfig(
        text_config_dict=dict(vocab_size=99, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=4,
                              max_position_embeddings=16,
                              eos_token_id=98, bos_token_id=97,
                              pad_token_id=96, hidden_act="quick_gelu"),
        vision_config_dict=dict(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=24, patch_size=8,
                                hidden_act="quick_gelu"),
        projection_dim=16,
    )


def test_clip_parity():
    from llm_compressor_tpu.evalx.clip_jax import (
        clip_config_from_hf, clip_scores, encode_image, encode_text,
        load_clip_params)

    torch.manual_seed(0)
    hf_cfg = _tiny_clip()
    model = transformers.CLIPModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = clip_config_from_hf(hf_cfg)
    params = load_clip_params(sd, cfg)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(3, 3, 24, 24)).astype(np.float32)
    ids = rng.integers(0, 96, (3, 16)).astype(np.int32)
    ids[:, 0] = 97
    ids[0, 5] = 98
    ids[1, 10] = 98
    ids[2, 15] = 98
    eot = (ids == 98).argmax(axis=-1)

    with torch.no_grad():
        ref_i = model.get_image_features(pixel_values=torch.from_numpy(px))
        ref_t = model.get_text_features(input_ids=torch.from_numpy(ids).long())
        ref_i = torch.nn.functional.normalize(ref_i, dim=-1).numpy()
        ref_t = torch.nn.functional.normalize(ref_t, dim=-1).numpy()

    got_i = np.asarray(encode_image(params, px, cfg=cfg))
    got_t = np.asarray(encode_text(params, ids, eot, cfg=cfg))
    np.testing.assert_allclose(got_i, ref_i, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_t, ref_t, rtol=2e-4, atol=2e-5)

    # torchmetrics clip_score semantics: max(0, 100 * cos)
    ref_s = np.maximum((ref_i * ref_t).sum(-1) * 100.0, 0.0)
    got_s = clip_scores(params, cfg, px, ids, eot)
    np.testing.assert_allclose(got_s, ref_s, rtol=2e-4, atol=2e-3)


def test_clip_preprocess_shapes():
    from llm_compressor_tpu.evalx.clip_jax import preprocess_images

    imgs = [np.zeros((30, 40, 3), np.uint8), np.zeros((50, 25, 3), np.uint8)]
    px = preprocess_images(imgs, image_size=24)
    assert px.shape == (2, 3, 24, 24)
    # normalized zeros = -mean/std
    np.testing.assert_allclose(px[0, 0, 0, 0], -0.48145466 / 0.26862954,
                               rtol=1e-5)


def _tiny_blip_sd_and_models():
    """Tiny HF BlipVisionModel + BlipTextModel (the HF port of the
    salesforce BLIP code the ImageReward package uses), renamed into the
    ImageReward checkpoint key scheme for our loader."""
    from transformers import BlipTextConfig, BlipVisionConfig
    from transformers.models.blip.modeling_blip import BlipVisionModel
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    vcfg = BlipVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            image_size=24, patch_size=8)
    # is_decoder=True builds per-layer cross-attention; forward() is called
    # with is_decoder=False so self-attention stays bidirectional — exactly
    # ImageReward's text_encoder (med.py BertModel, add_cross_attention).
    tcfg = BlipTextConfig(vocab_size=99, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, max_position_embeddings=16,
                          encoder_hidden_size=32, is_decoder=True)
    torch.manual_seed(1)
    vm = BlipVisionModel(vcfg).eval()
    tm = BlipTextModel(tcfg, add_pooling_layer=False).eval()

    sd = {}
    ren_v = {"embeddings.class_embedding": "cls_token",
             "embeddings.position_embedding": "pos_embed",
             "embeddings.patch_embedding": "patch_embed.proj",
             "post_layernorm": "norm"}
    for k, v in vm.state_dict().items():
        for a, b in ren_v.items():
            k = k.replace(a, b)
        k = (k.replace("encoder.layers.", "blocks.")
             .replace("layer_norm1", "norm1").replace("layer_norm2", "norm2")
             .replace("self_attn.qkv", "attn.qkv")
             .replace("self_attn.projection", "attn.proj"))
        sd["blip.visual_encoder." + k] = v.detach().numpy()
    for k, v in tm.state_dict().items():
        sd["blip.text_encoder." + k] = v.detach().numpy()
    # 5-linear reward head (ImageReward MLP Sequential indices)
    rng = np.random.default_rng(3)
    dims = [(32, 16), (16, 8), (8, 8), (8, 4), (4, 1)]
    for idx, (i_d, o_d) in zip((0, 2, 4, 6, 7), dims):
        sd[f"mlp.layers.{idx}.weight"] = rng.normal(
            size=(o_d, i_d)).astype(np.float32) * 0.1
        sd[f"mlp.layers.{idx}.bias"] = rng.normal(size=(o_d,)).astype(np.float32) * 0.1
    return sd, vm, tm


def test_image_reward_parity():
    from llm_compressor_tpu.evalx.image_reward_jax import (
        REWARD_MEAN, REWARD_STD, BlipConfig, encode_image_blip,
        encode_text_blip, load_image_reward_params, reward_scores)

    sd, vm, tm = _tiny_blip_sd_and_models()
    cfg = BlipConfig(v_hidden=32, v_inter=64, v_layers=2, v_heads=4,
                     image_size=24, patch_size=8, t_hidden=32, t_inter=64,
                     t_layers=2, t_heads=4, t_vocab=99, t_max_pos=16)
    params = load_image_reward_params(sd, cfg)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, 24, 24)).astype(np.float32)
    ids = rng.integers(0, 99, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0

    with torch.no_grad():
        ref_img = vm(pixel_values=torch.from_numpy(px)).last_hidden_state
        ref_txt = tm(input_ids=torch.from_numpy(ids).long(),
                     attention_mask=torch.from_numpy(mask),
                     encoder_hidden_states=ref_img,
                     encoder_attention_mask=torch.ones(ref_img.shape[:2]).long(),
                     is_decoder=False).last_hidden_state
        h = ref_txt[:, 0]
        for idx in (0, 2, 4, 6, 7):
            w = torch.from_numpy(sd[f"mlp.layers.{idx}.weight"])
            b = torch.from_numpy(sd[f"mlp.layers.{idx}.bias"])
            h = torch.nn.functional.linear(h, w, b)
        ref_r = ((h[:, 0] - REWARD_MEAN) / REWARD_STD).numpy()

    got_img = np.asarray(encode_image_blip(params, px, cfg=cfg))
    np.testing.assert_allclose(got_img, ref_img.numpy(), rtol=2e-4, atol=2e-5)
    got_txt = np.asarray(encode_text_blip(params, ids, mask.astype(np.int32),
                                          got_img, cfg=cfg))
    np.testing.assert_allclose(got_txt, ref_txt.numpy(), rtol=2e-4, atol=2e-5)
    got_r = np.asarray(reward_scores(params, px, ids,
                                     mask.astype(np.int32), cfg=cfg))
    np.testing.assert_allclose(got_r, ref_r, rtol=2e-3, atol=2e-4)


def test_t2i_evaluator_clipscore_plumbing(tmp_path, monkeypatch):
    """End-to-end evaluator flow: generate image sets, pair them with their
    prompts, and aggregate per-pair scores (scorer numerics covered by the
    parity tests above)."""
    from llm_compressor_tpu.evalx import t2i_eval as te

    rng = np.random.default_rng(0)

    def gen(prompt, seed=0):
        return rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)

    class StubScorer:
        def __init__(self, path):
            assert path == "/fake/clip"

        def score(self, images, prompts):
            assert len(images) == len(prompts)
            assert all(isinstance(p, str) and p for p in prompts)
            return np.full((len(images),), 31.25)

    from llm_compressor_tpu.evalx import clip_jax
    monkeypatch.setattr(clip_jax, "ClipScorer", StubScorer)
    ev = te.T2IEvaluator(gen, gen, out_dir=str(tmp_path), n_images_per_prompt=1,
                         clip_path="/fake/clip")
    res = ev.eval(metrics="clipscore", categories=["animals"])
    assert res["clipscore"] == 31.25
    # prompts were recorded for every generated file
    assert len(ev.prompts) == len(te.PROMPT_SETS["animals"])
