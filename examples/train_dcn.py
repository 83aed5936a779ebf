"""Train DCN on Criteo(-like) data — mirror of the reference benchmark
(example/dcn/train.py): 26 KV-embedded categorical + 13 numeric features,
deep tower + cross net, sigmoid CE; reports accuracy + AUC like
example/dcn/README.md:54-84.

Uses the real Criteo-Kaggle TSV when present (CRITEO_PATH env or
--data), else a planted-logistic criteo-like stream.

Usage: python examples/train_dcn.py --optimizer group_adam --lr 0.001
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--optimizer", default="adam",
                    choices=["adam", "adagrad", "group_adam",
                             "sparse_group_ftrl"])
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--train-batches", type=int, default=200)
    ap.add_argument("--eval-batches", type=int, default=20)
    ap.add_argument("--data", default=None)
    ap.add_argument("--cache-dir", default=None,
                    help="pre-tokenized binary cache dir (built on first "
                         "use from --data): parse+hash once, then epochs "
                         "stream memmapped slices ~10x faster than live "
                         "TSV parsing")
    ap.add_argument("--steps-per-loop", type=int, default=1,
                    help=">1 runs K train steps per dispatch "
                         "(make_train_step_scan + packed one-buffer feed, "
                         "the TPU iterations_per_loop idiom — amortizes "
                         "per-dispatch overhead and uploads one buffer "
                         "per K steps)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from tfplus_tpu import kv, train as tft
    from tfplus_tpu.data import criteo, synthetic
    from tfplus_tpu.models import DCN, init_state, make_train_step

    model = DCN(capacity=1 << 16)
    if args.optimizer == "adam":
        opt = tft.AdamOptimizer(learning_rate=args.lr)
    elif args.optimizer == "adagrad":
        opt = tft.AdagradOptimizer(learning_rate=args.lr)
    elif args.optimizer == "group_adam":
        opt = tft.GroupAdamOptimizer(learning_rate=args.lr)
    else:
        opt = tft.SparseGroupFtrlOptimizer(learning_rate=args.lr)
    tx = optax.adam(args.lr)
    state = init_state(model, opt, tx, seed=0)
    step = make_train_step(model, opt, tx, sparse_lr=args.lr)
    estep = make_train_step(model, opt, tx, sparse_lr=args.lr, train=False,
                            donate=False)

    path = criteo.available(args.data)
    if path and args.cache_dir:
        print("using binary cache:", args.cache_dir, "(source:", path + ")")
        cache = criteo.BinaryCriteoCache(
            criteo.build_binary_cache(path, args.cache_dir))
        train_iter = cache.batches(args.batch_size, args.train_batches,
                                   loop=True)
        eval_iter = cache.batches(args.batch_size, args.eval_batches)
    elif path:
        print("using real criteo data:", path)
        # threads>1 → native multithreaded prefetching loader (io/native.py)
        train_iter = criteo.batches(path, args.batch_size, args.train_batches,
                                    threads=8)
        eval_iter = criteo.batches(path, args.batch_size, args.eval_batches)
    else:
        print("criteo TSV not found — using planted criteo-like stream")
        gen = synthetic.CriteoLike(seed=0)
        train_iter = gen.batches(args.batch_size, args.train_batches)
        eval_iter = gen.batches(args.batch_size, args.eval_batches)

    def to_batch(b):
        return {
            "ids": {f"C{i+1}": kv.encode_ids_np_to_device(b["categorical"][:, i])
                    for i in range(26)},
            "features": jnp.asarray(b["numeric"]),
            "labels": jnp.asarray(b["label"]),
        }

    t0 = time.time()
    seen = 0
    if args.steps_per_loop > 1:
        import functools
        import jax
        from tfplus_tpu.data import make_packed_feed
        from tfplus_tpu.utils import packing as _pk
        K = args.steps_per_loop
        raw_step = make_train_step(model, opt, tx, sparse_lr=args.lr,
                                   jit=False)

        def host_batch(b):
            cats = b["categorical"]
            u = cats.astype(np.uint64)
            ids = np.stack(
                [(u & np.uint64(0xFFFFFFFF)).astype(np.uint32).astype(np.int32),
                 (u >> np.uint64(32)).astype(np.uint32).astype(np.int32)],
                axis=-1)                                  # [N, 26, 2]
            return {"ids": {f"C{i+1}": np.ascontiguousarray(ids[:, i])
                            for i in range(26)},
                    "features": np.ascontiguousarray(b["numeric"]),
                    "labels": np.ascontiguousarray(b["label"])}

        pack = unpack = scan_packed = None
        chunk = []
        i = 0
        for b in train_iter:
            chunk.append(host_batch(b))
            if len(chunk) < K:
                continue
            if pack is None:
                pack, unpack = make_packed_feed(chunk[0])

                @functools.partial(jax.jit, donate_argnums=(0,))
                def scan_packed(state, flat, day):
                    def body(s, f):
                        s2, loss, _ = raw_step(s, unpack(f), day)
                        return s2, loss
                    return jax.lax.scan(body, state, flat)

            # one upload + one dispatch for K steps; unpack fuses in-step
            flat = jnp.asarray(np.stack([pack(x) for x in chunk]))
            day = jnp.uint32(_pk.current_day() % (1 << 13))
            state, losses = scan_packed(state, flat, day)
            chunk = []
            seen += args.batch_size * K
            i += K
            print(f"step {i} loss {float(losses[-1]):.5f} "
                  f"({seen/(time.time()-t0):.0f} ex/s)", flush=True)
    else:
        for i, b in enumerate(train_iter):
            state, loss, _ = step(state, to_batch(b))
            seen += args.batch_size
            if i % 20 == 0:
                print(f"step {i} loss {float(loss):.5f} "
                      f"({seen/(time.time()-t0):.0f} ex/s)", flush=True)

    labels, scores = [], []
    for b in eval_iter:
        _, _, preds = estep(state, to_batch(b))
        labels.append(b["label"])
        scores.append(np.asarray(preds))
    labels = np.concatenate(labels)
    scores = np.concatenate(scores)
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    auc = ((ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2)
           / max(pos.sum() * (~pos).sum(), 1))
    acc = ((scores > 0) == pos).mean()
    print(f"eval accuracy: {acc:.5f} AUC: {auc:.5f}")
    total_rows = sum(int(kv.size(t)) for t in state.tables.values())
    print(f"total embedding rows: {total_rows}")


if __name__ == "__main__":
    main()
