"""Train DIN or BST on planted behavior-sequence data.

Beyond the reference's example zoo (NCF + DCN): DIN (arXiv:1706.06978)
attends the candidate over the click history with a learned activation
unit; BST (arXiv:1905.06874) runs transformer blocks over
[history..., candidate] through the Pallas flash-attention layer.
Framework pieces on display: one shared item KV table fed by TWO id
streams (candidate + flattened history, deduped into a single
probe/gather/apply pass) and variable-length sequences via padding masks.

Usage: python examples/train_din.py --cpu
       python examples/train_din.py --model bst --cpu
       python examples/train_din.py --optimizer group_adam
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="din", choices=["din", "bst"])
    ap.add_argument("--optimizer", default="adam",
                    choices=["adam", "adagrad", "group_adam",
                             "sparse_group_ftrl"])
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--train-batches", type=int, default=600)
    ap.add_argument("--eval-batches", type=int, default=10)
    ap.add_argument("--seq-len", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from tfplus_tpu import kv, train as tft
    from tfplus_tpu.data import synthetic
    from tfplus_tpu.models import BST, init_state, make_train_step
    from tfplus_tpu.models.din import DIN

    opts = {
        "adam": tft.AdamOptimizer,
        "adagrad": tft.AdagradOptimizer,
        "group_adam": lambda: tft.GroupAdamOptimizer(
            l1_regularization_strength=1e-5,
            l21_regularization_strength=1e-5),
        "sparse_group_ftrl": tft.SparseGroupFtrlOptimizer,
    }
    gen = synthetic.BehaviorSequence(n_items=5000, n_clusters=25,
                                     seq_len=args.seq_len, seed=0)
    if args.model == "bst":
        model = BST(embedding_dim=32, seq_len=args.seq_len, num_numeric=4,
                    num_heads=2, head_dim=32, num_blocks=2,
                    capacity=1 << 14)
    else:
        model = DIN(embedding_dim=32, seq_len=args.seq_len, num_numeric=4,
                    capacity=1 << 14)
    opt = opts[args.optimizer]()
    tx = optax.adam(args.lr)
    state = init_state(model, opt, tx, seed=0)
    step = make_train_step(model, opt, tx, sparse_lr=args.lr)

    def to_batch(b):
        return {
            "ids": {
                "item": kv.encode_ids_np_to_device(
                    model.pack_item_ids(b["cand"], b["seq"])),
                "user": kv.encode_ids_np_to_device(
                    b["user"].astype(np.int64)),
            },
            "features": {"numeric": jnp.asarray(b["numeric"]),
                         "mask": jnp.asarray(b["mask"])},
            "labels": jnp.asarray(b["label"]),
        }

    t0, seen = time.time(), 0
    for i, b in enumerate(gen.batches(args.batch_size, args.train_batches)):
        state, loss, _ = step(state, to_batch(b))
        seen += args.batch_size
        if (i + 1) % 50 == 0:
            rate = seen / max(time.time() - t0, 1e-9)
            print(f"step {i+1} loss {float(loss):.5f} ({rate:,.0f} ex/s)")

    estep = make_train_step(model, opt, tx, sparse_lr=args.lr, train=False,
                            donate=False)
    labels, scores = [], []
    for b in gen.batches(args.batch_size, args.eval_batches):
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
    from tfplus_tpu.kv import table as kvt
    print(f"eval AUC: {auc:.5f}")
    print(f"item rows: {kvt.stats(state.tables['item'])['size']} "
          f"user rows: {kvt.stats(state.tables['user'])['size']}")


if __name__ == "__main__":
    main()
