"""GB-scale checkpoint I/O measurement (VERDICT r4 item 3).

Streams a multi-GB table through checkpoint/saver.py:
  * to LOCAL disk (the bundle writer's streaming header/segment path with
    CRC32 — the path that exists to match the reference's streaming
    TensorBundle, tensor_bundle.cc:652-746), and
  * to the signature-verifying oss:// EMULATOR over loopback HTTP
    (protocol + multipart + CRC overhead; wire is loopback so this bounds
    protocol cost, not network).

Runs on the CPU backend on purpose: the bundle/CRC/disk path is
host-side by construction (device->host export is a separate leg of the
engine and, on this rig, would measure the axon tunnel's ~60 s/GB, not
the checkpoint stack). Prints one JSON line; PERF.md records the numbers.

Usage: python scripts/prof_checkpoint_io.py [--gb 4] [--dim 256] [--oss-gb 1]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_table(rows: int, dim: int, with_slots: bool):
    import jax.numpy as jnp
    import numpy as np
    from tfplus_tpu import kv, train as tft

    cap = 1
    while cap < rows * 2:
        cap *= 2
    t = kv.create(dim, cap, seed=0)
    if with_slots:
        t = tft.AdagradOptimizer().init(t)
    # bulk-fill in slabs (keeps peak memory bounded)
    slab = 1 << 19
    rng = np.random.RandomState(0)
    for start in range(0, rows, slab):
        n = min(slab, rows - start)
        ids = kv.encode_ids_np_to_device(
            np.arange(start + 1, start + 1 + n, dtype=np.int64))
        vals = jnp.asarray(rng.rand(n, dim).astype(np.float32))
        t = kv.insert(t, ids, vals)
    return t


def ckpt_bytes(prefix: str) -> int:
    d = os.path.dirname(prefix) or "."
    base = os.path.basename(prefix)
    return sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
               if f.startswith(base))


def timed_roundtrip(prefix: str, t, template_fn):
    from tfplus_tpu import kv
    from tfplus_tpu.checkpoint import saver

    t0 = time.perf_counter()
    saver.save(prefix, {"emb": t})
    t_save = time.perf_counter() - t0
    nbytes = ckpt_bytes(prefix)
    t0 = time.perf_counter()
    restored, _ = saver.restore(prefix, {"emb": template_fn()})
    t_restore = time.perf_counter() - t0
    # spot-verify: 1k random rows must match
    import numpy as np
    rows = int(jax.device_get(kv.size(t)))
    probe = np.random.RandomState(1).randint(1, rows, 1000).astype(np.int64)
    q = kv.encode_ids_np_to_device(probe)
    np.testing.assert_allclose(
        np.asarray(kv.lookup_or_zeros(restored["emb"], q)),
        np.asarray(kv.lookup_or_zeros(t, q)), rtol=1e-6)
    return {"bytes": nbytes,
            "save_s": round(t_save, 2),
            "save_gbps": round(nbytes / t_save / 1e9, 3),
            "restore_s": round(t_restore, 2),
            "restore_gbps": round(nbytes / t_restore / 1e9, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=4.0,
                    help="approx table payload GB for the local-disk leg")
    ap.add_argument("--oss-gb", type=float, default=1.0,
                    help="approx GB for the oss:// emulator leg (0=skip)")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--no-slots", action="store_true")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    global jax
    import jax
    jax.config.update("jax_platforms", "cpu")

    out = {"dim": args.dim, "with_slots": not args.no_slots}
    row_bytes = args.dim * 4 * (2 if not args.no_slots else 1)

    wd = args.workdir or tempfile.mkdtemp(prefix="ckptio_")
    try:
        # --- local disk ---------------------------------------------------
        rows = int(args.gb * 1e9 / row_bytes)
        t0 = time.perf_counter()
        t = build_table(rows, args.dim, not args.no_slots)
        out["build_s"] = round(time.perf_counter() - t0, 1)
        out["rows"] = rows

        def template():
            from tfplus_tpu import kv, train as tft
            tt = kv.create(args.dim, t.capacity, seed=9)
            if not args.no_slots:
                tt = tft.AdagradOptimizer().init(tt)
            return tt

        out["local"] = timed_roundtrip(os.path.join(wd, "ck"), t, template)

        # --- oss:// emulator ---------------------------------------------
        if args.oss_gb > 0:
            from tfplus_tpu.io import register_oss
            from tfplus_tpu.io.oss_emulator import OSSEmulator
            creds = {"test-id": "secret"}
            oss_rows = int(args.oss_gb * 1e9 / row_bytes)
            t_small = (t if oss_rows >= rows
                       else build_table(oss_rows, args.dim,
                                        not args.no_slots))
            with OSSEmulator(creds) as host:
                register_oss()
                prefix = (f"oss://bkt\x01id=test-id\x02key=secret"
                          f"\x02host={host}/ck")

                def template_s():
                    from tfplus_tpu import kv, train as tft
                    tt = kv.create(args.dim, t_small.capacity, seed=9)
                    if not args.no_slots:
                        tt = tft.AdagradOptimizer().init(tt)
                    return tt

                from tfplus_tpu.checkpoint import saver
                t0 = time.perf_counter()
                saver.save(prefix, {"emb": t_small})
                t_save = time.perf_counter() - t0
                t0 = time.perf_counter()
                restored, _ = saver.restore(prefix, {"emb": template_s()})
                t_restore = time.perf_counter() - t0
                import numpy as np
                from tfplus_tpu import kv
                nbytes = int(jax.device_get(kv.size(t_small))) * row_bytes
                out["oss_emulator"] = {
                    "approx_bytes": nbytes,
                    "save_s": round(t_save, 2),
                    "save_gbps": round(nbytes / t_save / 1e9, 3),
                    "restore_s": round(t_restore, 2),
                    "restore_gbps": round(nbytes / t_restore / 1e9, 3)}

        # --- raw disk reference (what the bundle path is up against) ------
        blob = os.urandom(1 << 28)                      # 256 MB
        p = os.path.join(wd, "raw.bin")
        t0 = time.perf_counter()
        with open(p, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        w = time.perf_counter() - t0
        os.system(f"sync")
        t0 = time.perf_counter()
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass
        r = time.perf_counter() - t0
        out["raw_disk"] = {"write_gbps": round(len(blob) / w / 1e9, 2),
                           "read_cached_gbps": round(len(blob) / r / 1e9, 2)}
    finally:
        if args.workdir is None:
            shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
