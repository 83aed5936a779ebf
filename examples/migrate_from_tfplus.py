"""End-to-end TFPlus migration demo.

1. Fabricates a REAL TFPlus-format checkpoint (TF TensorBundle with the
   reference tensor contract) — standing in for a production checkpoint.
2. Imports it into KvTables (elastic: any target shard count).
3. Resumes training on TPU-native kernels (GroupAdam).
4. Exports BACK to TFPlus format so an existing TF-based ranking service
   keeps working, and to the native streaming bundle for this framework.

Usage: python examples/migrate_from_tfplus.py [--cpu]
Requires tensorflow (only for the migration steps, imported lazily).
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fabricate_reference_checkpoint(prefix: str):
    """What a production TFPlus job would have left on disk."""
    import numpy as np
    import tensorflow as tf
    rng = np.random.RandomState(0)
    names, tensors = [], []

    def add(n, t):
        names.append(n)
        tensors.append(tf.constant(t))

    # 2-shard user table (name/part_i layout), uint16 freqs, one blacklist
    for part in range(2):
        ids = np.arange(part, 2000, 2, dtype=np.int64)
        add(f"user_emb/part_{part}-keys", ids)
        add(f"user_emb/part_{part}-values",
            rng.randn(len(ids), 16).astype(np.float32))
        add(f"user_emb/part_{part}-init_table",
            rng.randn(100, 16).astype(np.float32))
        add(f"user_emb/part_{part}-blacklist",
            ids[:3] if part == 0 else np.zeros((0,), np.int64))
        add(f"user_emb/part_{part}-freq_keys", ids)
        add(f"user_emb/part_{part}-freq_values",
            rng.randint(1, 900, len(ids)).astype(np.uint16))
    add("dnn/hidden0/kernel", rng.randn(16, 8).astype(np.float32))
    tf.raw_ops.SaveV2(prefix=prefix, tensor_names=names,
                      shape_and_slices=[""] * len(names), tensors=tensors)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from tfplus_tpu import kv, train as tft, checkpoint as ckpt
    from tfplus_tpu.checkpoint import tf_import, tf_export

    work = tempfile.mkdtemp()
    ref_ckpt = os.path.join(work, "tfplus.ckpt-100")
    fabricate_reference_checkpoint(ref_ckpt)
    print(f"[1] fabricated reference checkpoint at {ref_ckpt}")

    infos = tf_import.list_kv_variables(ref_ckpt)
    print(f"[2] discovered: { {k: v['num_shards'] for k, v in infos.items()} }"
          f" rows={ {k: v['rows'] for k, v in infos.items()} }")

    # elastic import: 2 checkpoint shards -> 3 tables
    shards = tf_import.import_kv_variable(ref_ckpt, "user_emb", num_shards=3,
                                          capacity=2048)
    w0 = tf_import.read_dense(ref_ckpt, "dnn/hidden0/kernel")
    total = sum(int(kv.size(s)) for s in shards)
    print(f"[3] imported into 3 shards, {total} rows; dense {w0.shape}")

    # resume training with the in-house GroupAdam on TPU-native kernels
    opt = tft.GroupAdamOptimizer(learning_rate=0.01)
    shards = [opt.init(s) for s in shards]
    rng = np.random.RandomState(1)
    for step in range(1, 4):
        for i, t in enumerate(shards):
            ids = np.arange(i, 400, 3, dtype=np.int64) * 3 + i  # this shard's
            ids = ids[ids % 3 == i][:64]
            if not len(ids):
                continue
            q = kv.encode_ids_np_to_device(ids)
            res = kv.lookup_or_insert(t, q)
            g = jnp.asarray(rng.randn(len(ids), 16).astype(np.float32)) * 0.01
            shards[i] = opt.apply(res.table, res.slot, g, lr=0.01, step=step)
    print("[4] resumed 3 training steps with GroupAdam")

    # native streaming checkpoint for this framework...
    native_prefix = os.path.join(work, "native-ckpt")
    shards = ckpt.save(native_prefix, {"user_emb": shards})["user_emb"]
    # ...and a TFPlus-format export for the existing serving stack
    back = os.path.join(work, "back-to-tfplus.ckpt-101")
    tf_export.export_checkpoint(back, {"user_emb": shards},
                                dense={"dnn/hidden0/kernel": np.asarray(w0)})
    import tensorflow as tf
    names = sorted(tf.train.load_checkpoint(back)
                   .get_variable_to_shape_map())
    print(f"[5] exported native bundle + TFPlus bundle "
          f"({len(names)} tensors, e.g. {names[:3]})")
    print("migration round-trip OK")


if __name__ == "__main__":
    main()
