import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from contrad_tpu.augment import get_augment
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import GANTrainer, create_train_state, make_optimizer

IMG = (32, 32, 3); BATCH = 512
for aug in ("none", "simclr"):
    g, d = get_architecture("sndcgan", IMG)
    go = make_optimizer(2e-4, (0.5, 0.999)); do = make_optimizer(2e-4, (0.5, 0.999))
    tr = GANTrainer(g, d, mode="contrad", augment_fn=get_augment(aug),
                    g_optimizer=go, d_optimizer=do, loss_type="nonsat", mesh=get_mesh())
    st = tr.place_state(create_train_state(jax.random.PRNGKey(0), g, d, IMG, go, do))
    data = np.random.default_rng(0).integers(0, 256, size=(BATCH,)+IMG, dtype=np.uint8)
    b = tr.place_batch(data)
    for _ in range(5): st, m = tr.train_step(st, b)
    jax.block_until_ready((st.g_params, m))
    for trial in range(3):
        t0 = time.perf_counter()
        N = 200
        for _ in range(N): st, m = tr.train_step(st, b)
        # checksum forces full materialization of the final state
        cs = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(st.d_params)))
        dt = (time.perf_counter()-t0)/N
        print(f"{aug:8s} trial{trial} {dt*1000:7.2f} ms/step  {BATCH/dt:7.0f} img/s  cs={cs:.3f}")
