"""Train NCF on MovieLens-shaped data — mirror of the reference demo
(example/NCFModel/train.py): user+movie KV embeddings -> MLP -> MSE,
20 epochs, loss must decrease.

Usage: python examples/train_ncf.py [--epochs 20] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--examples", type=int, default=100_000)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from tfplus_tpu import train as tft, checkpoint as ckpt
    from tfplus_tpu.data import movielens
    from tfplus_tpu.models import NCF, init_state, make_train_step

    # real ml-100k u.data when on disk (MOVIELENS_PATH), else synthetic
    data = movielens.load_or_synthetic(args.examples, seed=2021)
    args.examples = min(args.examples, len(data["rating"]))
    model = NCF()
    opt = tft.AdamOptimizer(learning_rate=args.lr)
    tx = optax.adam(args.lr)
    state = init_state(model, opt, tx, seed=2021)
    step = make_train_step(model, opt, tx, sparse_lr=args.lr)

    bs = args.batch_size
    n = args.examples - args.examples % bs
    for epoch in range(args.epochs):
        t0 = time.time()
        total = 0.0
        nb = 0
        for i in range(0, n, bs):
            batch = {
                "ids": {"user": jnp.asarray(data["user_id"][i:i+bs].astype(np.int32)),
                        "movie": jnp.asarray(data["movie_id"][i:i+bs].astype(np.int32))},
                "labels": jnp.asarray(data["rating"][i:i+bs]),
            }
            state, loss, _ = step(state, batch)
            total += float(loss)
            nb += 1
        dt = time.time() - t0
        print(f"epoch: {epoch} loss: {total/nb:.5f} "
              f"({n/dt:.0f} examples/s)", flush=True)

    from tfplus_tpu import kv
    print("user rows:", int(kv.size(state.tables["user"])),
          "movie rows:", int(kv.size(state.tables["movie"])))
    if args.ckpt_dir:
        mgr = ckpt.CheckpointManager(args.ckpt_dir)
        mgr.save(state.tables, dense=state.dense, step=int(state.step))
        print("checkpoint saved to", args.ckpt_dir)


if __name__ == "__main__":
    main()
