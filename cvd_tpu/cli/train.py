"""Training CLI — the reference's ``train_epi_control.py``.

    python -m cvd_tpu.cli.train --config configs/train_epi.yaml

Fine-tunes only the epi/sync/auxiliary parameters on folded RealEstate10K
pairs, data-parallel over the local device mesh. Supports resume, periodic
orbax + reference-format checkpoints, validation sampling with epipolar
sanity overlays, and CFG text dropout.
"""
from __future__ import annotations

import argparse
import os
import random
import time


def load_config(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def run_validation(modules, tokenizer, cfg, out_dir, step, state):
    """In-training validation sampling + epipolar sanity overlays
    (train_epi_control.py:402-494)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvd_tpu.data.validation import ValRealEstate10KPoseFolded
    from cvd_tpu.pipelines.simple import SimplePipeline
    from cvd_tpu.utils.video import save_videos_grid
    from cvd_tpu.utils.visualize import check_fundamental

    vcfg = cfg.get("validation_data") or {}
    if not vcfg.get("pose_file_0"):
        return
    n = cfg.get("sample_n_frames", 16)
    size = cfg.get("sample_size", 256)
    ds = ValRealEstate10KPoseFolded(
        validation_prompts=vcfg.get("prompts", ["a scenic video"]),
        pose_file_0=vcfg["pose_file_0"],
        pose_file_1=vcfg["pose_file_1"],
        sample_n_frames=n,
        sample_size=size,
    )
    sample = ds[0]
    # sample with the CURRENT training params
    import dataclasses as _dc

    live = _dc.replace(modules, unet_params=jax.device_get(state.params))
    pipe = SimplePipeline(live, F_mat_size=size)
    vids = np.asarray(
        pipe(
            jnp.asarray(tokenizer([sample["validation_prompt"]])),
            jnp.asarray(tokenizer([""])),
            jnp.asarray(sample["plucker_embedding"], jnp.float32).reshape(
                2, n, size, size, 6
            ),
            jnp.asarray(sample["F_mats"], jnp.float32).reshape(2, n, 3, 3),
            num_inference_steps=cfg.get("validation_steps_num", 25),
            rng=jax.random.key(step),
        )
    )
    vdir = f"{out_dir}/validation"
    save_videos_grid(vids, f"{vdir}/step-{step}.gif", n_rows=2)
    # epipolar overlay on the generated pair's middle frame
    import imageio

    overlay = check_fundamental(
        vids[0, n // 2], vids[1, n // 2], sample["F_mats"][n // 2]
    )
    imageio.imwrite(f"{vdir}/step-{step}-epi.png", overlay)


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvd_tpu.cli.build import build_modules
    from cvd_tpu.data.loader import DataLoader
    from cvd_tpu.data.realestate10k import RealEstate10KPoseFolded
    from cvd_tpu.parallel import create_mesh, replicate, shard_batch
    from cvd_tpu.train.checkpoint import restore_orbax, save_orbax, save_reference_ckpt
    from cvd_tpu.train.state import create_train_state
    from cvd_tpu.train.train_step import make_jitted_train_step
    from cvd_tpu.utils.logging import MetricsLogger, format_time, setup_logger

    if getattr(args, "multihost", False):
        # multi-host rendezvous (replaces the reference's NCCL/SLURM
        # init_dist, train_epi_control.py:41-69) — coordinator discovery is
        # automatic on TPU pods / SLURM / GKE
        jax.distributed.initialize()

    cfg = load_config(args.config)
    out_dir = cfg.get("output_dir", "runs/train")
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logger(out_dir, process_index=jax.process_index())
    if jax.process_index() == 0:
        # config snapshot (train_epi_control.py:175-186)
        import shutil

        shutil.copy(args.config, os.path.join(out_dir, "config.yaml"))
    metrics_log = MetricsLogger(out_dir, enabled=jax.process_index() == 0)

    # -- models -------------------------------------------------------------
    class A:  # adapt config dict to build_modules' arg object
        pass

    margs = A()
    for k in ("ori_model_path", "unet_subfolder", "motion_module_ckpt",
              "epi_module_ckpt", "pose_adaptor_ckpt", "image_lora_ckpt",
              "civitai_lora_ckpt", "civitai_base_model"):
        setattr(margs, k, cfg.get(k))
    margs.random_weights = cfg.get("random_weights", False)
    margs.pose_adaptor_scale = cfg.get("pose_adaptor_scale", 1.0)
    margs.bf16 = cfg.get("bf16", False)
    margs.unet_subfolder = margs.unet_subfolder or "unet"
    # sync-LoRA fine-tuning knobs (train_epi_control.py:117-118; params are
    # created iff rank>0 and scale!=0, and their "sync" names join the
    # trainable group)
    margs.sync_lora_rank = cfg.get("sync_lora_rank", 0)
    margs.sync_lora_scale = cfg.get("sync_lora_scale", 1.0)
    margs.image_lora_rank = cfg.get("lora_rank", 4)
    # remat checkpoint policy: 'dots' trades the HBM freed by
    # cache_latents for fewer recomputed matmuls in the backward
    margs.remat_policy = cfg.get("remat_policy", "")

    sample_size = cfg.get("sample_size", 256)
    n_frames = cfg.get("sample_n_frames", 16)
    modules, tokenizer = build_modules(margs, n_frames, sample_size)

    # -- data ---------------------------------------------------------------
    # dataset selection by name (train_epi_control.py:71-92). Hybrid training
    # keeps each BATCH kind-homogeneous (all-posed or all-unposed) and
    # alternates kinds across steps, so each jitted step signature stays
    # fixed-shape; the reference mixes kinds across DDP ranks the same way.
    train_cfg = dict(cfg.get("train_data", {}))
    dataset_name = train_cfg.pop("dataset_name", "realestate10k")
    seed = cfg.get("global_seed", 42)

    def make_re10k(c):
        return RealEstate10KPoseFolded(
            root_path=c["root_path"],
            sample_stride=c.get("sample_stride", 2),
            sample_n_frames=n_frames,
            sample_size=sample_size,
            seed=seed,
        )

    def make_webvid(c):
        from cvd_tpu.data.webvid import WebVidFolded

        return WebVidFolded(
            root_path=c["root_path"],
            sample_n_frames=n_frames,
            sample_size=sample_size,
            seed=seed,
        )

    def make_re10k_remote(c):
        from cvd_tpu.data.remote import RealEstate10KPoseFoldedRemote

        return RealEstate10KPoseFoldedRemote(
            base_url=c["base_url"], cache_dir=c.get("cache_dir"),
            sample_stride=c.get("sample_stride", 2),
            sample_n_frames=n_frames, sample_size=sample_size, seed=seed,
        )

    def make_webvid_remote(c):
        from cvd_tpu.data.remote import WebVid10MRemote

        return WebVid10MRemote(
            base_url=c["base_url"], cache_dir=c.get("cache_dir"),
            sample_n_frames=n_frames, sample_size=sample_size, seed=seed,
        )

    if dataset_name in ("realestate10k", "realestate10k_local"):
        sources = [("posed", make_re10k(train_cfg), 1.0)]
    elif dataset_name == "realestate10k_remote":
        sources = [("posed", make_re10k_remote(train_cfg), 1.0)]
    elif dataset_name == "webvid10m":
        sources = [("unposed", make_webvid(train_cfg), 1.0)]
    elif dataset_name == "webvid10m_remote":
        sources = [("unposed", make_webvid_remote(train_cfg), 1.0)]
    elif dataset_name == "hybrid":
        ratio = float(train_cfg.get("posed_ratio", 0.5))
        sources = [
            ("posed", make_re10k(train_cfg["realestate10k"]), ratio),
            ("unposed", make_webvid(train_cfg["webvid10m"]), 1.0 - ratio),
        ]
    else:
        raise SystemExit(f"Unsupported dataset_name: {dataset_name!r}")

    if cfg.get("cache_latents", False):
        # encode-once latents cache (data/latents_cache.py): removes the
        # per-step VAE encode (the reference re-encodes every clip every
        # epoch, train_epi_control.py:514-523). Built on first run; posed
        # sources only (unposed batches need warped_masks over pixels).
        from cvd_tpu.data.latents_cache import (
            CachedLatentsDataset, build_latents_cache,
        )

        cached_sources = []
        for kind, dataset, weight in sources:
            if kind != "posed":
                cached_sources.append((kind, dataset, weight))
                continue
            cdir = cfg.get("latents_cache_dir",
                           os.path.join(out_dir, "latents_cache"))
            if not os.path.isdir(cdir) or not any(
                f.endswith(".npz") for f in os.listdir(cdir)
            ):
                logger.info(f"building latents cache at {cdir}")
                build_latents_cache(
                    dataset, modules, cdir,
                    num_items=cfg.get("latents_cache_items"),
                    log=logger.info,
                )
            cached_sources.append((kind, CachedLatentsDataset(cdir), weight))
        sources = cached_sources

    loaders = []
    for kind, dataset, weight in sources:
        loader = DataLoader(
            dataset,
            batch_size=cfg.get("train_batch_size", 1),
            num_workers=cfg.get("num_workers", 8),
            # "process" scales decode across host cores (the reference's
            # num_workers=32 DataLoader, train_epi_control.py:298-306);
            # "thread" (default) fits small hosts and tests
            worker_type=cfg.get("worker_type", "thread"),
            seed=seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        logger.info(
            f"dataset[{kind}]: {len(dataset)} clips, {len(loader)} steps/epoch"
        )
        if len(loader) == 0:
            raise SystemExit(
                f"empty {kind} dataset/loader "
                f"(batch={cfg.get('train_batch_size', 1)}) — nothing to train on"
            )
        loaders.append((kind, loader, weight))

    # -- state + mesh ---------------------------------------------------------
    mesh = create_mesh()
    # mixed precision: frozen UNet leaves stored in bf16, trainable leaves
    # kept as f32 masters (the reference's AMP reads frozen weights in fp16,
    # train_epi_control.py:589-599). Full-size 16f/256px training does NOT
    # fit a 16 GB chip with f32 frozen masters (17.65 GiB peak).
    frozen_dtype = {
        "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
        "float32": None, "f32": None,
    }[cfg.get("frozen_weights_dtype", "bfloat16")]
    state = create_train_state(
        modules.unet_params,
        learning_rate=cfg.get("learning_rate", 1e-4),
        adam_weight_decay=cfg.get("adam_weight_decay", 1e-2),
        max_grad_norm=cfg.get("max_grad_norm", 1.0),
        scheduler=cfg.get("lr_scheduler", "constant"),
        warmup_steps=cfg.get("lr_warmup_steps", 0),
        total_steps=cfg.get("max_train_steps", 100_000),
        frozen_dtype=frozen_dtype,
    )
    # free the pre-cast tree: frozen leaves now live in the state (bf16)
    modules.unet_params = state.params
    global_step, epoch = 0, 0
    if cfg.get("resume_from"):
        state, meta = restore_orbax(cfg["resume_from"], state)
        global_step = int(state.step)
        epoch = int(meta.get("epoch", 0))
        logger.info(f"resumed from {cfg['resume_from']} at step {global_step}")
    state = replicate(state, mesh)
    step_fn = make_jitted_train_step(
        modules, mesh,
        F_mat_size=sample_size,
        epi_loss_weight=cfg.get("epi_loss_weight", 0.002),
    )

    max_steps = cfg.get("max_train_steps", 100_000)
    ckpt_every = cfg.get("checkpointing_steps", 5000)
    log_every = cfg.get("logger_interval", 10)
    null_ratio = cfg.get("cfg_random_null_text_ratio", 0.1)
    rng = jax.random.key(cfg.get("global_seed", 42) + jax.process_index())
    pyrng = random.Random(cfg.get("global_seed", 42))

    def fold(x):
        # fold the 2F-frame pair video-major like torch.cat(chunk(2,1)) (:516)
        return np.concatenate([x[:, :n_frames], x[:, n_frames:]], axis=0)

    def fold_batch(batch, texts):
        device_batch = {
            "text_ids": np.concatenate([tokenizer(texts)] * 2, axis=0),
        }
        if "latent_mean" in batch:  # pre-encoded cache (data/latents_cache.py)
            device_batch["latent_mean"] = fold(batch["latent_mean"])
            device_batch["latent_logvar"] = fold(batch["latent_logvar"])
        else:
            device_batch["pixel_values"] = fold(batch["pixel_values"])
        if "plucker_embedding" in batch:  # posed (RealEstate10K)
            device_batch["plucker"] = fold(batch["plucker_embedding"])
            device_batch["F_mats"] = fold(batch["F_mats"])
        else:  # unposed (WebVid): pseudo-epipolar homographies + masks
            device_batch["H_mats"] = fold(batch["H_mats"])
            device_batch["warped_masks"] = fold(batch["warped_masks"])
        return device_batch

    def sanity_dump(batch, texts):
        """First-iteration raw-batch dumps (do_sanity_check,
        train_epi_control.py:503-510) + an epipolar/homography overlay from
        the TRAINING batch (:419-431)."""
        import imageio

        from cvd_tpu.utils.video import save_videos_grid
        from cvd_tpu.utils.visualize import check_fundamental

        sdir = os.path.join(out_dir, "sanity_check")
        os.makedirs(sdir, exist_ok=True)
        px = batch["pixel_values"]  # [b, 2F, H, W, 3] in [-1, 1]
        for i, text in enumerate(texts):
            name = "-".join(text.replace("/", "").split()[:10]) or f"0-{i}"
            save_videos_grid((px[i : i + 1] + 1) / 2,
                             os.path.join(sdir, f"{name}.gif"))
        mats = batch.get("F_mats", batch.get("H_mats"))
        if mats is not None:
            overlay = check_fundamental(
                px[0, n_frames // 2], px[0, n_frames + n_frames // 2],
                mats[0, n_frames // 2],
            )
            imageio.imwrite(os.path.join(sdir, "epi_overlay.png"), overlay)

    def endless(loader):
        while True:
            yield from loader

    iters = [(kind, endless(loader), weight) for kind, loader, weight in loaders]
    steps_per_epoch = max(1, len(loaders[0][1]))
    # in hybrid mode steps are drawn from multiple sources by weight, so
    # "epoch" means passes over the PRIMARY (first) dataset: count its
    # draws (seeded at global_step so resume keeps the epoch monotonic)
    primary_draws = global_step
    do_sanity = cfg.get("do_sanity_check", True)
    sched_rng = random.Random(seed + 1)

    logger.info("training starts")
    t_iter = time.time()
    while global_step < max_steps:
        # pick this step's (kind-homogeneous) source by weight
        if len(iters) == 1:
            kind, it, _ = iters[0]
        else:
            r, acc = sched_rng.random(), 0.0
            for kind, it, weight in iters:
                acc += weight
                if r < acc:
                    break
        if it is iters[0][1]:
            primary_draws += 1
        batch = next(it)
        t_data = time.time()
        texts = [
            "" if pyrng.random() < null_ratio else t for t in batch["text"]
        ]
        if do_sanity and global_step == 0 and jax.process_index() == 0 \
                and "pixel_values" in batch:  # cached-latents batches carry no pixels
            sanity_dump(batch, batch["text"])
        device_batch = shard_batch(
            jax.tree_util.tree_map(jnp.asarray, fold_batch(batch, texts)),
            mesh,
        )
        rng, step_rng = jax.random.split(rng)
        state, m = step_fn(state, device_batch, step_rng)
        global_step += 1

        if global_step % log_every == 0:
            loss = float(m["loss"])
            now = time.time()
            logger.info(
                f"iter {global_step}/{max_steps} loss {loss:.4f} "
                f"epi {float(m['epi_loss']):.4f} "
                f"data {now - t_iter - (now - t_data):.2f}s "
                f"iter {now - t_data:.2f}s "
                f"ETA {format_time((now - t_iter) * (max_steps - global_step))}"
            )
            metrics_log.log(global_step, loss=loss, epi_loss=float(m["epi_loss"]))
        t_iter = time.time()

        val_every = cfg.get("validation_steps", 0)
        if (
            jax.process_index() == 0 and val_every
            and global_step % val_every == 0
        ):
            run_validation(modules, tokenizer, cfg, out_dir, global_step, state)

        if jax.process_index() == 0 and global_step % ckpt_every == 0:
            ck = os.path.join(out_dir, "checkpoints", f"step-{global_step}")
            save_orbax(ck, jax.device_get(state), {"epoch": epoch})
            save_reference_ckpt(
                os.path.join(out_dir, "checkpoints",
                             f"checkpoint-step-{global_step}.ckpt"),
                jax.device_get(state.params), epoch, global_step,
            )
            logger.info(f"saved checkpoint at step {global_step}")
        epoch = primary_draws // steps_per_epoch
    logger.info("training done")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host training")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
