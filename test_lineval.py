#!/usr/bin/env python
"""Linear evaluation CLI (reference: ``test_lineval.py``).

Loads a trained D, freezes the backbone, trains a linear probe on the
penultimate features: 100 epochs SGD lr=0.1, MultiStep gamma=0.1 at
[60, 75, 90] (reference ``:149-150``), with the SupContrast linear-eval
augmentation (RRC(0.2,1) + HFlip — reference ``datasets.py:23-47``) applied
ON DEVICE inside the jitted probe step (the reference does it in CPU
torchvision transforms). Logs a CSV with the reference's schema and saves the
probe head.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Linear evaluation of D features")
    p.add_argument("logdir", type=str, help="Run logdir with the D checkpoint")
    p.add_argument("architecture", type=str)
    p.add_argument("--n_classes", default=10, type=int)
    p.add_argument("--dataset", default=None, type=str,
                   help="Override the probe dataset (default: derived from "
                        "the run config's options.dataset, e.g. cifar10 -> "
                        "cifar10_lin; reference test_lineval.py:134)")
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--ckpt", default="latest", type=str)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"])
    return p.parse_args()


def main():
    P = parse_args()
    import jax

    if P.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from contrad_tpu.utils import enable_compile_cache

    enable_compile_cache()  # dedup programs across runs

    import jax.numpy as jnp
    import optax

    from contrad_tpu.augment import compose, horizontal_flip, random_resize_crop
    from contrad_tpu.data import BatchIterator, get_dataset
    from contrad_tpu.evaluate.classifier import accuracy, cross_entropy, test_classifier
    from contrad_tpu.training.step import make_d_apply
    from contrad_tpu.utils.run_loading import load_run

    cfg, _, discriminator, state, image_size = load_run(
        P.logdir, P.architecture, ckpt=P.ckpt)
    base = cfg.options.dataset
    if P.dataset is not None:
        dataset = P.dataset
    elif base.startswith("cifar10") and not base.startswith("cifar100"):
        dataset = "cifar10_lin"
    elif base.startswith("cifar100"):
        dataset = "cifar100_lin"
    elif base.startswith("synthetic"):
        dataset = base  # smoke path
    else:
        raise NotImplementedError(f"linear eval undefined for {base}")

    train_set, test_set, _ = get_dataset(dataset)
    d_apply = make_d_apply(discriminator)

    # Mesh-sharded probe training: the frozen backbone forward dominates;
    # batches shard over the data axis with the backbone/probe replicated
    # (GSPMD inserts the psum for the probe's batch-mean gradient). The
    # reference trains the probe on one GPU (test_lineval.py:63-98).
    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.parallel.mesh import (batch_sharding, host_batched,
                                           replicate, round_up_batch)

    mesh = get_mesh()
    P.batch_size = round_up_batch(P.batch_size, mesh)
    b_shard = batch_sharding(mesh)
    d_params, d_state = replicate((state.d_params, state.d_state), mesh)

    # SupContrast linear-eval augmentation, on device.
    lin_aug = compose(random_resize_crop(scale=(0.2, 1.0)), horizontal_flip())

    def features(x):
        """Frozen eval-mode penultimate features (reference test_lineval.py:79-82)."""
        (_, aux), _ = d_apply(d_params, d_state, x, train=False)
        return jax.lax.stop_gradient(aux["penultimate"])

    d_penul = discriminator.d_penul
    w_init = jnp.zeros((d_penul, P.n_classes))
    b_init = jnp.zeros((P.n_classes,))
    probe = {"w": w_init, "b": b_init}

    milestones = [60, 75, 90]

    def lr_at(epoch):
        lr = 0.1
        for m in milestones:
            if epoch >= m:
                lr *= 0.1
        return lr

    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=0.1)
    probe = replicate(probe, mesh)
    opt_state = tx.init(probe)

    @jax.jit
    def train_step(probe, opt_state, images, labels, rng, lr):
        x = images.astype(jnp.float32) / 255.0
        x = lin_aug(rng, x)
        feats = features(x)

        def loss_fn(p):
            logits = feats @ p["w"] + p["b"]
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(probe)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, probe)
        probe = optax.apply_updates(probe, updates)
        return probe, opt_state, loss, logits

    @jax.jit
    def eval_logits(x, probe):
        # probe passed explicitly: a closure would be baked at first trace;
        # x arrives as [0,1] floats (host_batched scales uint8 inputs)
        return features(x) @ probe["w"] + probe["b"]

    seed_tag = int(np.random.randint(10000))
    csv_path = os.path.join(P.logdir, f"lin_eval_{seed_tag}.csv")
    with open(csv_path, "w") as f:
        f.write("epoch,time,lr,train loss,train acc,test loss,test acc\n")

    rng = jax.random.PRNGKey(P.seed)
    steps_per_epoch = len(train_set) // P.batch_size
    loader = BatchIterator(train_set, P.batch_size, seed=P.seed)

    for epoch in range(P.epochs):
        t0 = time.time()
        lr = lr_at(epoch)
        tr_loss, tr_acc, n_seen = 0.0, 0.0, 0
        for _ in range(steps_per_epoch):
            images, labels = next(loader)
            rng, sub = jax.random.split(rng)
            probe, opt_state, loss, logits = train_step(
                probe, opt_state,
                jax.device_put(np.asarray(images), b_shard),
                jax.device_put(np.asarray(labels), b_shard),
                sub, lr)
            (acc1,) = accuracy(np.asarray(logits), labels, topk=(1,))
            tr_loss += float(loss) * len(labels)
            tr_acc += acc1 * len(labels)
            n_seen += len(labels)

        test_iter = (
            (test_set.images[i : i + P.batch_size],
             test_set.labels[i : i + P.batch_size])
            for i in range(0, len(test_set), P.batch_size))

        # one shared pad/shard/slice wrapper (ragged test-set tails)
        logits_fn = host_batched(lambda x: eval_logits(x, probe), mesh)
        out = test_classifier(logits_fn, test_iter, ["loss", "error@1"])

        dt = time.time() - t0
        row = (f"{epoch},{dt:.8},{lr:.4},{tr_loss / n_seen:.4},"
               f"{tr_acc / n_seen:.4},{out['loss']:.4},"
               f"{100 - out['error@1']:.4}\n")
        with open(csv_path, "a") as f:
            f.write(row)
        print(f"Epoch {epoch}: * [Loss {out['loss']:.3f}] "
              f"[Err@1 {out['error@1']:.3f}]")

    np.savez(os.path.join(P.logdir, f"lin_eval_{seed_tag}.npz"),
             w=np.asarray(probe["w"]), b=np.asarray(probe["b"]))
    print(f"Saved probe to lin_eval_{seed_tag}.npz; log: {csv_path}")


if __name__ == "__main__":
    main()
