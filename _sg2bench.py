import sys, time
import jax, numpy as np
from contrad_tpu.augment import get_augment
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import create_train_state, make_optimizer
from contrad_tpu.training.step import StyleGAN2Trainer

arch, size, batch, mode, aug = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5]
IMG = (size, size, 3)
g, d = get_architecture(arch, IMG)
go = make_optimizer(2.5e-3, (0.0, 0.99)); do = make_optimizer(2.5e-3, (0.0, 0.99))
tr = StyleGAN2Trainer(g, d, mode=mode, augment_fn=get_augment(aug),
                      g_optimizer=go, d_optimizer=do, loss_type="nonsat",
                      lbd_r1=0.5, d_reg_every=16, mesh=get_mesh())
st = tr.place_state(create_train_state(jax.random.PRNGKey(0), g, d, IMG, go, do, ema=True))
b = tr.place_batch(np.random.default_rng(0).integers(0, 256, size=(batch,)+IMG, dtype=np.uint8))
for _ in range(3): st, m = tr.train_step(st, b, ema_decay=0.99, do_r1=False)
jax.block_until_ready((st.g_params, m))
for trial in range(2):
    t0 = time.perf_counter(); N = 30
    for _ in range(N): st, m = tr.train_step(st, b, ema_decay=0.99, do_r1=False)
    jax.block_until_ready((st.g_params, m))
    dt = (time.perf_counter()-t0)/N
    print(f"{arch} {size}px b{batch} {mode}/{aug} trial{trial}: {dt*1000:.1f} ms/step {batch/dt:.0f} img/s")
# R1 step cost
st, m = tr.train_step(st, b, ema_decay=0.99, do_r1=True)
jax.block_until_ready((st.g_params, m))
t0 = time.perf_counter()
for _ in range(10): st, m = tr.train_step(st, b, ema_decay=0.99, do_r1=True)
jax.block_until_ready((st.g_params, m))
print(f"  with R1: {(time.perf_counter()-t0)/10*1000:.1f} ms/step")
