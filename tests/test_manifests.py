"""Checkpoint key-manifest validation (VERDICT round 1, Missing #3).

The manifests in cvd_tpu.io.manifests enumerate the COMPLETE key+shape sets
of every artifact kind the reference loads. These tests prove, without the
real files, that:

* every manifest key routes through merge_torch_state onto a full-size Flax
  parameter with the exact transformed shape (dry-run over eval_shape trees
  — zero unmapped keys, the reference's strict-load contract);
* the union of artifact manifests covers every Flax UNet parameter (nothing
  is left checkpoint-unfillable);
* io.ldm_convert maps a full synthetic LDM-layout dict onto exactly the
  diffusers manifests (two independently-derived naming paths agree);
* the torch oracles (independent transcriptions of the reference modules)
  produce state dicts with exactly the manifest key+shape sets.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cvd_tpu.io import manifests as M
from cvd_tpu.io.key_mapping import SKIP_SUBSTRINGS, merge_torch_state, vae_legacy_rename


@pytest.fixture(scope="module")
def shapes():
    from cvd_tpu.pipelines.common import abstract_param_shapes

    return abstract_param_shapes()


def _n_params(tree):
    from flax import traverse_util

    return len(traverse_util.flatten_dict(tree["params"]))


def _dry_merge(tree, manifest, **kw):
    state = M.zeros_state(manifest)
    _, consumed = merge_torch_state(tree, state, strict=True, dry_run=True, **kw)
    assert len(consumed) == len(state), "some manifest keys were not consumed"
    return consumed


def _n_skipped(manifest):
    return sum(1 for k in manifest if any(s in k for s in SKIP_SUBSTRINGS))


def test_sd15_unet_manifest_maps_completely(shapes):
    _dry_merge(shapes["unet"], M.sd15_unet_manifest())


def test_sd15_vae_manifest_maps_completely(shapes):
    _dry_merge(shapes["vae"], M.sd15_vae_manifest(), rename=vae_legacy_rename)


def test_sd15_clip_manifest_maps_completely(shapes):
    from cvd_tpu.io.checkpoints import clip_rename

    _dry_merge(shapes["clip"], M.sd15_clip_manifest(), rename=clip_rename)


def test_animatediff_v3_mm_manifest_maps_completely(shapes):
    _dry_merge(shapes["unet"], M.animatediff_v3_mm_manifest())


def test_cvd_epi_manifest_maps_completely(shapes):
    _dry_merge(shapes["unet"], M.cvd_epi_ckpt_manifest())


def test_cameractrl_manifests_map_completely(shapes):
    _dry_merge(shapes["pose"], M.cameractrl_pose_encoder_manifest())
    _dry_merge(shapes["unet"], M.cameractrl_attention_processor_manifest())


def test_unet_fully_covered_by_artifact_union(shapes):
    """Every Flax UNet parameter is fillable from some artifact: SD1.5 base
    + AnimateDiff mm + CVD epi + CameraCtrl qkv_merge account for every leaf
    (one torch weight per param; skipped buffers excluded)."""
    mans = [
        M.sd15_unet_manifest(),
        M.animatediff_v3_mm_manifest(),
        M.cvd_epi_ckpt_manifest(),
        M.cameractrl_attention_processor_manifest(),
    ]
    mapped = sum(len(m) - _n_skipped(m) for m in mans)
    assert mapped == _n_params(shapes["unet"])


def test_vae_clip_pose_fully_covered(shapes):
    assert (
        len(M.sd15_vae_manifest()) == _n_params(shapes["vae"])
    )
    clip_m = M.sd15_clip_manifest()
    assert len(clip_m) - _n_skipped(clip_m) == _n_params(shapes["clip"])
    pose_m = M.cameractrl_pose_encoder_manifest()
    assert len(pose_m) - _n_skipped(pose_m) == _n_params(shapes["pose"])


def test_ldm_unet_converter_matches_diffusers_manifest():
    """convert_ldm_unet_state over a full synthetic LDM dict must produce
    exactly the diffusers manifest (keys AND shapes)."""
    from cvd_tpu.io.ldm_convert import convert_ldm_unet_state

    converted = convert_ldm_unet_state(M.zeros_state(M.ldm_sd15_unet_manifest()))
    want = M.sd15_unet_manifest()
    assert set(converted) == set(want)
    for k, v in converted.items():
        assert v.shape == want[k], k


def test_ldm_vae_converter_matches_diffusers_manifest():
    from cvd_tpu.io.ldm_convert import convert_ldm_vae_state

    converted = convert_ldm_vae_state(M.zeros_state(M.ldm_sd15_vae_manifest()))
    renamed = {vae_legacy_rename(k): v for k, v in converted.items()}
    want = M.sd15_vae_manifest()
    assert set(renamed) == set(want)
    for k, v in renamed.items():
        if v.ndim == 4 and v.shape[:2] != want[k][:2]:
            continue  # legacy 1x1-conv attn proj; importer squeezes
        if len(want[k]) == 2 and v.ndim == 4:
            assert v.shape[2:] == (1, 1) or v.shape == want[k], k
        else:
            assert v.shape == tuple(want[k]), k


def test_ldm_vae_civitai_import_dry_run(shapes):
    """The civitai VAE path end-to-end: LDM dict -> converter -> importer
    (legacy renames + 1x1-conv squeeze) with zero unmapped keys."""
    from cvd_tpu.io.ldm_convert import convert_ldm_vae_state

    converted = convert_ldm_vae_state(M.zeros_state(M.ldm_sd15_vae_manifest()))
    _, consumed = merge_torch_state(
        shapes["vae"], converted, rename=vae_legacy_rename, strict=True,
        dry_run=True,
    )
    assert len(consumed) == len(converted)


def test_ldm_clip_converter_matches_manifest():
    from cvd_tpu.io.ldm_convert import convert_ldm_clip_state

    converted = convert_ldm_clip_state(M.zeros_state(M.ldm_sd15_clip_manifest()))
    assert set(converted) == set(M.sd15_clip_manifest())


def test_manifests_match_torch_oracles():
    """Cross-check the enumerations against the independently transcribed
    torch oracles' real state dicts (keys + shapes) at full size (meta
    device: no weight memory)."""
    import torch

    from reference_oracle import modules as ref

    with torch.device("meta"):
        pose = ref.CameraPoseEncoder(
            downscale_factor=8, channels=list(M.CH), nums_rb=2, cin=384,
            temporal_attention_nhead=8, temporal_position_encoding=True,
            temporal_position_encoding_max_len=16,
        )
    want = M.cameractrl_pose_encoder_manifest()
    got = {k: tuple(v.shape) for k, v in pose.state_dict().items()}
    assert got == want

    with torch.device("meta"):
        mm = ref.VanillaTemporalModule(
            in_channels=M.CH[0], num_attention_heads=8,
            num_transformer_block=1,
            attention_block_types=("Temporal_Self", "Temporal_Self"),
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=32, zero_initialize=False,
        )
        epi = ref.EpiModule(
            in_channels=M.CH[0], num_attention_heads=8,
            num_transformer_block=1,
            attention_block_types=("Epi_Self", "Epi_Self"),
        )
    mm_manifest = M.animatediff_v3_mm_manifest()
    prefix = "down_blocks.0.motion_modules.0."
    want_mm = {k[len(prefix):]: v for k, v in mm_manifest.items()
               if k.startswith(prefix)}
    got_mm = {k: tuple(v.shape) for k, v in mm.state_dict().items()}
    assert got_mm == want_mm

    epi_manifest = M.cvd_epi_ckpt_manifest()
    prefix = "down_blocks.0.epi_modules.0."
    want_epi = {k[len(prefix):]: v for k, v in epi_manifest.items()
                if k.startswith(prefix)}
    # the ckpt manifest is params-only; the oracle state_dict adds the
    # pos_encoder.coords buffer (skipped on import)
    got_epi = {k: tuple(v.shape) for k, v in epi.state_dict().items()
               if "pos_encoder.coords" not in k}
    assert got_epi == want_epi


def test_cvd_sync_lora_manifest_maps_completely():
    """A sync-enabled fine-tune's extra ckpt keys route onto a sync-enabled
    full-size tree (rank rule: channels // image_lora_rank, unet.py:1092)."""
    import dataclasses

    from cvd_tpu.models.unet import UNetConfig
    from cvd_tpu.pipelines.common import abstract_param_shapes

    cfg = UNetConfig(sync_lora_rank=4, sync_lora_scale=1.0,
                     spatial_lora_rank=-4)
    shapes = abstract_param_shapes(unet_config=cfg)
    _dry_merge(shapes["unet"], M.cvd_sync_lora_manifest(
        sync_lora_rank=4, image_lora_rank=4))


@pytest.mark.parametrize("simplified", [False, True])
def test_sparsectrl_manifest_maps_completely(simplified):
    """Full-size SparseCtrl ckpt layout routes onto SparseControlNetModel
    (pyramid and simplified/v3-RGB embeddings)."""
    import jax
    import jax.numpy as jnp

    from cvd_tpu.models.sparse_controlnet import SparseControlNetModel
    from cvd_tpu.models.unet import UNetConfig

    cond_ch = 4 if simplified else 3
    model = SparseControlNetModel(
        UNetConfig(), conditioning_channels=cond_ch,
        use_simplified_condition_embedding=simplified,
    )
    B, F, h = 1, 2, 8
    cond_res = h if simplified else 8 * h  # simplified conditions on latents
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((B, F, h, h, 4)), jnp.zeros((B,), jnp.int32),
            jnp.zeros((B, 7, 768)), jnp.zeros((B, F, cond_res, cond_res, cond_ch)),
            jnp.zeros((B, F, cond_res, cond_res, 1)),
        ),
        jax.random.key(0),
    )
    from cvd_tpu.io.checkpoints import sparsectrl_rename

    _dry_merge(shapes, M.animatediff_sparsectrl_manifest(simplified=simplified),
               rename=sparsectrl_rename)
