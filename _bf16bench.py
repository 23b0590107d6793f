import sys, time
import jax, jax.numpy as jnp, numpy as np
from contrad_tpu.augment import get_augment
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import GANTrainer, create_train_state, make_optimizer
from contrad_tpu.training.step import StyleGAN2Trainer

def bench_sndcgan(dtype, tag):
    IMG=(32,32,3); BATCH=512
    g,d = get_architecture("sndcgan", IMG, dtype=dtype)
    go=make_optimizer(2e-4,(0.5,0.999)); do=make_optimizer(2e-4,(0.5,0.999))
    tr = GANTrainer(g,d,mode="contrad",augment_fn=get_augment("simclr"),
                    g_optimizer=go,d_optimizer=do,loss_type="nonsat",mesh=get_mesh())
    st = tr.place_state(create_train_state(jax.random.PRNGKey(0),g,d,IMG,go,do))
    b = tr.place_batch(np.random.default_rng(0).integers(0,256,size=(BATCH,)+IMG,dtype=np.uint8))
    for _ in range(5): st,m = tr.train_step(st,b)
    jax.block_until_ready((st.g_params,m))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(100): st,m = tr.train_step(st,b)
        jax.block_until_ready((st.g_params,m))
        best=min(best,(time.perf_counter()-t0)/100)
    print(f"sndcgan b512 {tag}: {best*1000:.2f} ms/step {BATCH/best:.0f} img/s  D_loss={float(m['D_loss']):.3f}")

def bench_sg512(dtype, tag):
    IMG=(512,512,3); BATCH=8
    g,d = get_architecture("stylegan2_512", IMG, dtype=dtype)
    go=make_optimizer(2.5e-3,(0.0,0.99)); do=make_optimizer(2.5e-3,(0.0,0.99))
    tr = StyleGAN2Trainer(g,d,mode="contrad",augment_fn=get_augment("simclr_hq"),
                          g_optimizer=go,d_optimizer=do,loss_type="nonsat",
                          lbd_r1=0.5,d_reg_every=16,mesh=get_mesh())
    st = tr.place_state(create_train_state(jax.random.PRNGKey(0),g,d,IMG,go,do,ema=True))
    b = tr.place_batch(np.random.default_rng(0).integers(0,256,size=(BATCH,)+IMG,dtype=np.uint8))
    for _ in range(3): st,m = tr.train_step(st,b,ema_decay=0.99,do_r1=False)
    jax.block_until_ready((st.g_params,m))
    best=1e9
    for _ in range(2):
        t0=time.perf_counter()
        for _ in range(30): st,m = tr.train_step(st,b,ema_decay=0.99,do_r1=False)
        jax.block_until_ready((st.g_params,m))
        best=min(best,(time.perf_counter()-t0)/30)
    print(f"stylegan2_512 b8 {tag}: {best*1000:.1f} ms/step {BATCH/best:.1f} img/s  D_loss={float(m['D_loss']):.3f}")

which = sys.argv[1]
dtype = jnp.bfloat16 if sys.argv[2]=="bf16" else jnp.float32
(bench_sndcgan if which=="sndcgan" else bench_sg512)(dtype, sys.argv[2])
