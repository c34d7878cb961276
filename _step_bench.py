import jax, jax.numpy as jnp, numpy as np, time
from s2anet_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()
from s2anet_tpu.models.detector import S2ANet
from s2anet_tpu.parallel.step import make_train_step
from s2anet_tpu.train.optim import build_optimizer
from s2anet_tpu.train.state import create_train_state
from s2anet_tpu.utils.config import ModelConfig

B, S = 8, 1024
model = S2ANet(backbone_name="resnet50", num_classes=15)
rng = np.random.default_rng(0)
var = model.init(jax.random.PRNGKey(0), jnp.zeros((1,S,S,3), jnp.bfloat16), train=False)
tx = build_optimizer(lambda s: 0.01, params_example=var["params"])
state = create_train_state(var["params"], var.get("batch_stats", {}), tx)
mc = ModelConfig()
step = make_train_step(model, tx, imgs_size=(S,S), num_classes=15, model_cfg=mc)

imgs = jnp.asarray(rng.uniform(size=(B,S,S,3)).astype(np.float32))
G = 64
gtb = np.zeros((B,G,5), np.float32); gtb[:, :20] = rng.uniform(100, 900, (B,20,5)); gtb[:, :20, 2:4] = rng.uniform(20, 120, (B,20,2)); gtb[:, :20, 4] = rng.uniform(-0.7, 0.7, (B,20))
batch = {"imgs": imgs, "gt_boxes": jnp.asarray(gtb),
         "gt_classes": jnp.asarray(rng.integers(0,15,(B,G)).astype(np.int32)),
         "gt_mask": jnp.asarray((np.arange(G)[None,:] < 20).repeat(B,0).reshape(B,G))}
t0 = time.perf_counter()
state, items = step(state, batch); _ = np.asarray(items)
print(f"first: {time.perf_counter()-t0:.0f}s", flush=True)
ts = []
for _ in range(6):
    t0=time.perf_counter(); state, items = step(state, batch); _ = np.asarray(items); ts.append(time.perf_counter()-t0)
print(f"train step: {min(ts)*1e3:.0f} ms")

import jax.profiler
jax.profiler.start_trace("/tmp/step_trace")
for _ in range(3):
    state, items = step(state, batch); _ = np.asarray(items)
jax.profiler.stop_trace()
print("trace saved")
