"""Checkpoint-import tests with synthetic reference-shaped state dicts.

export_torch_state (flax -> torch names) and merge_torch_state (torch ->
flax) must be exact inverses over every model family; values round-trip
bit-exactly and unexpected keys raise.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from cvd_tpu.io.key_mapping import (
    export_torch_state,
    flax_path_to_torch_key,
    merge_torch_state,
    torch_key_to_flax_path,
)
from cvd_tpu.io.lora import fuse_lora_into_unet_state
from cvd_tpu.models.epi import EpiConditioning
from cvd_tpu.models.unet import UNet3DConditionModel, UNetConfig
from cvd_tpu.models.vae import AutoencoderKL, VAEConfig
from cvd_tpu.models.pose_encoder import CameraPoseEncoder
from cvd_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    attention_heads=4,
    cross_attention_dim=16,
    norm_num_groups=8,
)


def randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    flat = traverse_util.flatten_dict(params["params"])
    flat = {
        k: jnp.asarray(rng.standard_normal(v.shape), jnp.float32) for k, v in flat.items()
    }
    return {"params": traverse_util.unflatten_dict(flat)}


@pytest.fixture(scope="module")
def tiny_unet_params():
    model = UNet3DConditionModel(TINY)
    B, F, H, W = 2, 2, 16, 16
    cond = EpiConditioning(
        F_mats=jnp.zeros((B * F, 3, 3)), video_length=F, rand_slope_ff=False
    )
    params = model.init(
        jax.random.key(0),
        jnp.zeros((B, F, H, W, 4)),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, 7, 16)),
        None,
        cond,
    )
    return params


def test_key_translation_examples():
    cases = {
        "down_blocks.0.resnets.1.norm1.weight": ("down_blocks_0", "resnets_1", "norm1"),
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight": (
            "down_blocks_1", "attentions_0", "transformer_blocks_0", "attn1", "to_q"),
        "mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj.weight": (
            "mid_block", "attentions_0", "transformer_blocks_0", "ff", "net_0_proj"),
        "up_blocks.2.motion_modules.1.temporal_transformer.transformer_blocks.0."
        "attention_blocks.0.to_q.weight": (
            "up_blocks_2", "motion_modules_1", "transformer_blocks_0",
            "attention_blocks_0", "to_q"),
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0."
        "attention_blocks.0.processor.qkv_merge.weight": (
            "down_blocks_0", "motion_modules_0", "transformer_blocks_0",
            "attention_blocks_0", "qkv_merge"),
        "down_blocks.0.epi_modules.1.epi_transformer.proj_out.weight": (
            "down_blocks_0", "epi_modules_1", "proj_out"),
        "encoder_down_conv_blocks.2.0.in_conv.weight": (
            "encoder_down_conv_blocks_2_0", "in_conv"),
    }
    for torch_key, flax_path in cases.items():
        got = torch_key_to_flax_path(torch_key[: -len(".weight")])
        assert got == flax_path, f"{torch_key}: {got}"
        # inverse
        assert flax_path_to_torch_key(flax_path + ("kernel",)) == torch_key


@pytest.mark.slow
def test_unet_roundtrip_full_coverage(tiny_unet_params):
    params = randomize(tiny_unet_params, 1)
    torch_state = export_torch_state(params)
    blank = randomize(tiny_unet_params, 2)
    restored, consumed = merge_torch_state(blank, torch_state)
    assert len(consumed) == len(torch_state)
    a = traverse_util.flatten_dict(params["params"])
    b = traverse_util.flatten_dict(restored["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=str(k))


@pytest.mark.slow
def test_partial_load_motion_only(tiny_unet_params):
    # a motion-module-only ckpt (like AnimateDiff's) loads without touching
    # other params, and bad keys raise
    params = randomize(tiny_unet_params, 3)
    torch_state = export_torch_state(params)
    mm_state = {k: v for k, v in torch_state.items() if "motion_modules" in k}
    assert len(mm_state) > 100
    blank = randomize(tiny_unet_params, 4)
    merged, consumed = merge_torch_state(blank, mm_state)
    assert len(consumed) == len(mm_state)
    a = traverse_util.flatten_dict(merged["params"])
    orig = traverse_util.flatten_dict(blank["params"])
    want = traverse_util.flatten_dict(params["params"])
    for k in a:
        if "motion_modules" in str(k):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(want[k]))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(orig[k]))

    with pytest.raises(KeyError):
        merge_torch_state(blank, {"down_blocks.9.bogus.weight": np.zeros((3, 3))})


def test_vae_roundtrip():
    vae = AutoencoderKL(VAEConfig(block_out_channels=(32, 32, 64, 64), norm_num_groups=8))
    params = vae.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), jax.random.key(2))
    params = randomize(params, 5)
    state = export_torch_state(params)
    assert "encoder.down_blocks.0.resnets.0.conv1.weight" in state
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in state
    assert "encoder.mid_block.attentions.0.to_q.weight" in state
    blank = randomize(params, 6)
    restored, consumed = merge_torch_state(blank, state)
    assert len(consumed) == len(state)
    a = traverse_util.flatten_dict(params["params"])
    b = traverse_util.flatten_dict(restored["params"])
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_pose_encoder_roundtrip():
    enc = CameraPoseEncoder(channels=(32, 64, 64, 64), cin=384)
    params = enc.init(jax.random.key(3), jnp.zeros((1, 2, 32, 32, 6)))
    params = randomize(params, 7)
    state = export_torch_state(params)
    assert "encoder_conv_in.weight" in state
    assert "encoder_down_conv_blocks.1.0.in_conv.weight" in state
    assert (
        "encoder_down_attention_blocks.0.0.attention_blocks.0.to_q.weight" in state
    )
    blank = randomize(params, 8)
    restored, consumed = merge_torch_state(blank, state)
    assert len(consumed) == len(state)
    a = traverse_util.flatten_dict(params["params"])
    b = traverse_util.flatten_dict(restored["params"])
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_clip_import_from_hf_names():
    from cvd_tpu.io.checkpoints import clip_rename

    cfg = CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64, max_position_embeddings=16)
    enc = CLIPTextEncoder(cfg)
    params = enc.init(jax.random.key(4), jnp.zeros((1, 16), jnp.int32))
    rng = np.random.default_rng(9)

    state = {}
    state["text_model.embeddings.token_embedding.weight"] = rng.standard_normal((64, 32)).astype(np.float32)
    state["text_model.embeddings.position_embedding.weight"] = rng.standard_normal((16, 32)).astype(np.float32)
    state["text_model.embeddings.position_ids"] = np.arange(16)[None]
    for i in range(2):
        p = f"text_model.encoder.layers.{i}."
        for mod, shape in [
            ("self_attn.q_proj", (32, 32)), ("self_attn.k_proj", (32, 32)),
            ("self_attn.v_proj", (32, 32)), ("self_attn.out_proj", (32, 32)),
            ("mlp.fc1", (64, 32)), ("mlp.fc2", (32, 64)),
        ]:
            state[p + mod + ".weight"] = rng.standard_normal(shape).astype(np.float32)
            state[p + mod + ".bias"] = rng.standard_normal(shape[0]).astype(np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            state[p + ln + ".weight"] = rng.standard_normal(32).astype(np.float32)
            state[p + ln + ".bias"] = rng.standard_normal(32).astype(np.float32)
    state["text_model.final_layer_norm.weight"] = rng.standard_normal(32).astype(np.float32)
    state["text_model.final_layer_norm.bias"] = rng.standard_normal(32).astype(np.float32)

    merged, consumed = merge_torch_state(params, state, rename=clip_rename)
    assert len(consumed) == len(state)
    flat = traverse_util.flatten_dict(merged["params"])
    np.testing.assert_array_equal(
        np.asarray(flat[("token_embedding", "embedding")]),
        state["text_model.embeddings.token_embedding.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(flat[("layers_0", "self_attn", "q_proj", "kernel")]),
        state["text_model.encoder.layers.0.self_attn.q_proj.weight"].T,
    )


def test_lora_fusion():
    rng = np.random.default_rng(10)
    key = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"
    W = rng.standard_normal((32, 32)).astype(np.float32)
    down = rng.standard_normal((4, 32)).astype(np.float32)
    up = rng.standard_normal((32, 4)).astype(np.float32)
    lora = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor.to_q_lora.down.weight": down,
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor.to_q_lora.up.weight": up,
    }
    fused = fuse_lora_into_unet_state({key: W}, lora, scale=0.5)
    np.testing.assert_allclose(fused[key], W + 0.5 * up @ down, rtol=1e-6)

    with pytest.raises(KeyError):
        fuse_lora_into_unet_state({key: W}, {"unmatched.down.weight": down})


def test_motion_lora_fusion_matches_reference_algorithm():
    """fuse_motion_lora_into_state vs a torch transcription of
    convert_motion_lora_ckpt_to_diffusers (:28-49) on a synthetic
    motion-LoRA dict covering q/k/v and the to_out.0 rename."""
    import torch

    from cvd_tpu.io.lora import fuse_motion_lora_into_state

    rng = np.random.default_rng(0)
    C, R = 32, 4
    base = ("down_blocks.0.motion_modules.0.temporal_transformer."
            "transformer_blocks.0.attention_blocks.0")
    state = {}
    for proj in ("to_q", "to_k", "to_v"):
        state[f"{base}.{proj}.weight"] = rng.standard_normal((C, C)).astype(np.float32)
    state[f"{base}.to_out.0.weight"] = rng.standard_normal((C, C)).astype(np.float32)

    lora = {}
    for proj in ("to_q", "to_k", "to_v", "to_out"):
        lora[f"{base}.processor.{proj}_lora.down.weight"] = \
            rng.standard_normal((R, C)).astype(np.float32)
        lora[f"{base}.processor.{proj}_lora.up.weight"] = \
            rng.standard_normal((C, R)).astype(np.float32)

    alpha = 0.8
    got = fuse_motion_lora_into_state(state, lora, scale=alpha)

    # reference algorithm, verbatim semantics on torch tensors
    want = {k: torch.from_numpy(v.copy()) for k, v in state.items()}
    for key in lora:
        if "up." in key:
            continue
        up_key = key.replace(".down.", ".up.")
        model_key = (key.replace("processor.", "").replace("_lora", "")
                     .replace("down.", "").replace("up.", ""))
        model_key = model_key.replace("to_out.", "to_out.0.")
        want[model_key] = want[model_key] + alpha * torch.mm(
            torch.from_numpy(lora[up_key]), torch.from_numpy(lora[key]))

    assert set(got) == set(want)
    for k in got:
        np.testing.assert_allclose(got[k], want[k].numpy(), rtol=1e-6, atol=1e-6)

    with pytest.raises(KeyError):
        fuse_motion_lora_into_state(
            state, {"nonexistent.processor.to_q_lora.down.weight": lora[
                f"{base}.processor.to_q_lora.down.weight"],
                "nonexistent.processor.to_q_lora.up.weight": lora[
                f"{base}.processor.to_q_lora.up.weight"]})


def test_sparse_controlnet_ckpt_roundtrip(tmp_path):
    """A synthetic SparseCtrl ckpt (reference key layout) imports strictly
    into SparseControlNetModel at matching values via load_sparse_controlnet
    (tiny config; the full-size layout is covered by the manifest test)."""
    import torch

    from cvd_tpu.cli.build import SMOKE_UNET, load_sparse_controlnet
    from cvd_tpu.models.sparse_controlnet import SparseControlNetModel

    model = SparseControlNetModel(SMOKE_UNET, conditioning_channels=3)
    B, F, h = 1, 2, 8
    variables = model.init(
        jax.random.key(1), jnp.zeros((B, F, h, h, 4)),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, 7, SMOKE_UNET.cross_attention_dim)),
        jnp.zeros((B, F, 8 * h, 8 * h, 3)), jnp.zeros((B, F, 8 * h, 8 * h, 1)),
    )

    # synthesize the reference-layout state dict from the flax tree: invert
    # the flat layer names back into the ckpt's nested block paths
    import re

    def to_torch_key(path):
        els = []
        for i, el in enumerate(path):
            if el == "Conv_0":
                continue
            leaf = i == len(path) - 1
            if leaf:
                els.append({"kernel": "weight", "scale": "weight"}.get(el, el))
                continue
            m = re.fullmatch(
                r"(down_blocks)_(\d+)_(resnets|attentions|motion_modules|"
                r"downsamplers)_(\d+)", el)
            if m:
                els.append(f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}")
                if m.group(3) == "motion_modules":
                    els.append("temporal_transformer")
                continue
            m = re.fullmatch(r"mid_block_(resnets|attentions)_(\d+)", el)
            if m:
                els.append(f"mid_block.{m.group(1)}.{m.group(2)}")
                continue
            el = re.sub(r"_(\d+)$", r".\1", el)
            el = {"net_0_proj": "net.0.proj", "net_2": "net.2",
                  "to_out_0": "to_out.0"}.get(el, el)
            els.append(el)
        return ".".join(els)

    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables["params"])
    rng = np.random.default_rng(0)
    state = {}
    for path, v in flat.items():
        arr = rng.standard_normal(v.shape).astype(np.float32)
        tv = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else (
            arr.T if path[-1] == "kernel" else arr)
        state[to_torch_key(path)] = torch.from_numpy(np.ascontiguousarray(tv))
    ckpt = tmp_path / "sparsectrl.ckpt"
    torch.save({"state_dict": state}, ckpt)

    model2, params = load_sparse_controlnet(str(ckpt), SMOKE_UNET)
    flat2 = traverse_util.flatten_dict(params["params"])
    assert set(flat2) == set(flat)
    # values round-trip exactly (kernel transposes cancel)
    n_checked = 0
    for path, v in flat2.items():
        tv = state[to_torch_key(path)].numpy()
        tv = tv.transpose(2, 3, 1, 0) if tv.ndim == 4 else (
            tv.T if path[-1] == "kernel" else tv)
        np.testing.assert_array_equal(np.asarray(v), tv)
        n_checked += 1
    assert n_checked > 100
