"""AOT peak-HBM probe: compile a full-size program WITHOUT executing it and
print XLA's memory analysis. Safe against a shared TPU worker — nothing is
ever launched, so a program that wouldn't fit cannot crash the worker (the
round-3/4 6-view attempts died exactly that way; reference config:
run_inference_advanced.sh:34-36).

Usage:
  python scripts/mem_probe.py train [block|layer]
  python scripts/mem_probe.py advanced [views] [multistep] [accumulate]

Prints one JSON line: temp/arg/output/alias bytes and the resident peak
estimate (args + outputs + temps - aliased), all in GiB.
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def _analyze(lowered, label):
    import numpy as np  # noqa: F401

    t0 = time.time()
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    GiB = 1024 ** 3
    peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    print(json.dumps({
        "probe": label,
        "compile_seconds": round(time.time() - t0, 1),
        "temp_gib": round(ma.temp_size_in_bytes / GiB, 2),
        "arg_gib": round(ma.argument_size_in_bytes / GiB, 2),
        "out_gib": round(ma.output_size_in_bytes / GiB, 2),
        "alias_gib": round(ma.alias_size_in_bytes / GiB, 2),
        "peak_resident_gib": round(peak / GiB, 2),
        "generated_code_mb": round(ma.generated_code_size_in_bytes / 1e6, 1),
    }), flush=True)


def _modules():
    import jax.numpy as jnp

    import bench as B

    class Args:
        frames, size, f32, tiny = 16, 256, False, False
        scan_layers = False

    modules, _ = B._build_modules(Args(), jnp.bfloat16)
    return modules, Args()


def probe_train(unit: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from cvd_tpu import geometry as G
    from cvd_tpu.models import layers as _layers
    from cvd_tpu.train.state import create_train_state
    from cvd_tpu.train.train_step import train_step

    modules, args = _modules()
    modules.unet = type(modules.unet)(
        dataclasses.replace(modules.unet.config, remat_unit=unit))
    F, IMG, Bv = args.frames, args.size, 4
    c2ws, K, plucker, ids, _ = B._camera_inputs(4, F, IMG)
    c2 = jnp.asarray(c2ws, jnp.float32).reshape(4, F, 4, 4)
    K2 = jnp.asarray(K, jnp.float32).reshape(4, F, 3, 3)
    F02 = G.fundamental_between_views(c2[0], c2[2], K2[0], K2[2])
    F13 = G.fundamental_between_views(c2[1], c2[3], K2[1], K2[3])
    F_mats = jnp.stack([F02, F13, jnp.swapaxes(F02, -1, -2),
                        jnp.swapaxes(F13, -1, -2)])
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.standard_normal((Bv, F, IMG, IMG, 3), np.float32) * 0.5),
        "text_ids": jnp.concatenate([ids] * Bv, axis=0),
        "plucker": jnp.asarray(plucker[:Bv], jnp.float32),
        "F_mats": F_mats,
    }
    state = create_train_state(modules.unet_params, frozen_dtype=jnp.bfloat16)
    modules.unet_params = state.params
    frozen = {"vae": modules.vae_params, "clip": modules.clip_params,
              "pose": modules.pose_encoder_params}

    def step(state, batch, rng, frozen_params):
        return train_step(state, batch, modules, rng, frozen_params,
                          F_mat_size=IMG)

    _layers.FLASH_SPATIAL, _layers.SHARD_MESH = True, None
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(0), frozen)
    _analyze(lowered, f"train-B{Bv}-{F}f-{IMG}px-remat_{unit}-bf16")


def probe_advanced(views: int, multistep: int, accumulate: int):
    import jax
    import jax.numpy as jnp

    import bench as B
    from cvd_tpu.models import layers as _layers
    from cvd_tpu.pipelines.advanced import AdvancedPipeline

    modules, args = _modules()
    F, IMG = args.frames, args.size
    c2ws, K, plucker, ids, neg = B._camera_inputs(views, F, IMG)
    pipe = AdvancedPipeline(modules, F_mat_size=IMG)
    from functools import partial

    fn = jax.jit(
        partial(pipe._run, num_inference_steps=25, guidance_scale=8.5,
                multistep=multistep, accumulate_step=accumulate, decode=True),
        donate_argnums=(3,),
    )
    _layers.FLASH_SPATIAL = pipe.use_flash_kernel
    _layers.SHARD_MESH = None
    lowered = fn.lower(
        modules.params_bundle(), ids, neg, plucker,
        jnp.asarray(c2ws, jnp.float32), jnp.asarray(K, jnp.float32),
        None, None, jax.random.key(0), None,
    )
    _analyze(lowered,
             f"advanced-{views}view-ms{multistep}-acc{accumulate}-bf16")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    if mode == "train":
        probe_train(sys.argv[2] if len(sys.argv) > 2 else "block")
    else:
        probe_advanced(
            int(sys.argv[2]) if len(sys.argv) > 2 else 6,
            int(sys.argv[3]) if len(sys.argv) > 3 else 6,
            int(sys.argv[4]) if len(sys.argv) > 4 else 2,
        )
