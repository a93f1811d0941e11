"""Time trace / lower / compile stages of the simple pipeline on TPU.

--cold: use a throwaway compilation-cache dir so `compile` measures a
true cold server compile instead of a persistent-cache hit.
"""
import os, time, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_imp0 = time.time()
from cvd_tpu.utils.cache import enable_compilation_cache
if "--cold" in sys.argv:
    import tempfile
    enable_compilation_cache(tempfile.mkdtemp(prefix="cvd_cold_cache_"))
else:
    enable_compilation_cache()
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from cvd_tpu import geometry as G
from cvd_tpu.geometry.trajectories import default_intrinsics
from cvd_tpu.io.tokenizer import HashTokenizer
from cvd_tpu.models.clip_text import CLIPTextConfig
from cvd_tpu.models.unet import UNetConfig
from cvd_tpu.models.vae import VAEConfig
from cvd_tpu.pipelines.common import PipelineModules
from cvd_tpu.pipelines.simple import SimplePipeline
print(f"imports: {time.time()-t_imp0:.1f}s", file=sys.stderr, flush=True)

dtype = jnp.bfloat16
t0 = time.time()
modules = PipelineModules.create(
    unet_config=UNetConfig(dtype=dtype), vae_config=VAEConfig(dtype=dtype),
    clip_config=CLIPTextConfig(), latent_size=32, video_length=16,
    fast_init=True)  # host-side init: no device init programs in the split
modules.cast_params()  # bf16 bundle, same as the bench deployment
print(f"init: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

V, F, IMG = 2, 16, 256
c2ws = G.circle_trajectory(V, F, camera_dist=0.4)
K = default_intrinsics(V, F, IMG, IMG)
intr = np.stack([K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2]], -1)
plucker = G.ray_condition(
    jnp.asarray(intr, jnp.float32)[None], jnp.asarray(c2ws, jnp.float32)[None],
    IMG, IMG)[0].reshape(V, F, IMG, IMG, 6)
tok = HashTokenizer()
ids = jnp.asarray(tok(["a cinematic fly-through of a modern house"]))
neg = jnp.asarray(tok([""]))
Fp = G.fundamental_between_views(
    jnp.asarray(c2ws[:F], jnp.float32), jnp.asarray(c2ws[F:], jnp.float32),
    jnp.asarray(K[:F], jnp.float32), jnp.asarray(K[F:], jnp.float32))
F_mats = jnp.stack([Fp, jnp.swapaxes(Fp, -1, -2)])

pipe = SimplePipeline(modules, F_mat_size=IMG)
from cvd_tpu.models import layers as _layers
_layers.FLASH_SPATIAL = pipe.use_flash_kernel
_layers.SHARD_MESH = None

fn = jax.jit(partial(pipe._run, num_inference_steps=25, guidance_scale=8.5,
                     decode=True, multidiff_total_steps=1,
                     multidiff_overlaps=12, window_length=None))
args = (modules.params_bundle(), ids, neg, plucker, F_mats, jax.random.key(0), None)

t0 = time.time()
traced = fn.trace(*args)
t1 = time.time()
print(f"trace: {t1-t0:.1f}s", file=sys.stderr, flush=True)
lowered = traced.lower()
t2 = time.time()
print(f"lower: {t2-t1:.1f}s", file=sys.stderr, flush=True)
compiled = lowered.compile()
t3 = time.time()
print(f"compile: {t3-t2:.1f}s", file=sys.stderr, flush=True)
out = compiled(*args)
leaf = jax.tree_util.tree_leaves(out)[0]
_ = np.asarray(leaf[(0,)*leaf.ndim])
t4 = time.time()
print(f"first run: {t4-t3:.1f}s", file=sys.stderr, flush=True)
out = compiled(*args)
leaf = jax.tree_util.tree_leaves(out)[0]
_ = np.asarray(leaf[(0,)*leaf.ndim])
print(f"second run: {time.time()-t4:.1f}s", file=sys.stderr, flush=True)
