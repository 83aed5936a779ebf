"""Serving demo: train briefly, export for serving, load the export in a
"server" with no training code or templates, and answer embedding queries
over HTTP — the reference's ranking-service flow (ranking_utils metadata +
prediction-mode checkpoint) as a runnable end-to-end story.

Usage: python examples/serving_demo.py [--cpu] [--port 8571]
       (runs a self-test against its own server, then exits; pass --serve to
        stay up)
"""
import argparse
import json
import os
import sys
import tempfile
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def train_and_export(directory):
    import numpy as np
    from tfplus_tpu import kv, train, serving

    opt = train.AdamOptimizer(learning_rate=0.01)
    tables, md = {}, serving.RankingMetadata()
    rng = np.random.RandomState(0)
    for name, vocab in (("user_emb", 500), ("item_emb", 2000)):
        t = opt.init(kv.create(16, 4096, seed=hash(name) % 97))
        for step in range(1, 4):
            ids = kv.encode_ids_np_to_device(
                rng.randint(0, vocab, 512).astype(np.int64))
            u = kv.unique_with_counts(ids)
            res = kv.lookup_or_insert(t, u.unique_keys, counts=u.counts)
            g = res.rows * 0.1 + 0.01
            t = opt.apply(res.table, res.slot, g, lr=0.01, step=step)
        tables[name] = t
        md.add_embedding_column(column_name=name.split("_")[0],
                                var_name=name, embedding_dim=16)
    serving.export_for_serving(directory, tables, md)
    return tables


class EmbeddingServer:
    """Loads an export directory; serves /signature and /embed lookups."""

    def __init__(self, directory, quantize=False, sharded=False):
        import numpy as np
        from tfplus_tpu import kv, serving
        self.kv, self.np = kv, np
        self.quantize = quantize
        self.sharded = sharded
        if sharded:
            # mesh serving: one table shard per device, queries answered
            # with the trainer's all-to-all exchange (f32 or int8) — the
            # vocabulary scales with the mesh, not one chip's HBM
            import jax
            from tfplus_tpu import parallel as par
            from tfplus_tpu.parallel import serving as msrv
            self.mesh = par.make_mesh(jax.device_count())
            self.ndev = jax.device_count()
            self.tables, self.metadata = msrv.load_for_serving_sharded(
                directory, self.mesh, quantize=quantize)
            self.lookups = {var: msrv.make_serving_lookup(t, self.mesh)
                            for var, t in self.tables.items()}
        else:
            self.tables, self.metadata = serving.load_for_serving(
                directory, quantize=quantize)
        self.by_column = {c["column_name"]: c
                          for c in self.metadata._columns}

    def embed(self, column, ids):
        kv, np = self.kv, self.np
        if self.sharded:
            col = self.by_column[column]
            var = (col["embedding_var_keys"][0][:-len("-keys")]
                   .split("/part_")[0])
            ids64 = np.asarray(ids, np.int64)
            pad = (-len(ids64)) % self.ndev      # batch must divide the mesh
            padded = np.concatenate([ids64, np.zeros(pad, np.int64)])
            import jax.numpy as jnp
            rows = np.asarray(self.lookups[var](
                jnp.asarray(kv.encode_ids(padded))))
            return rows[:len(ids64)]
        from tfplus_tpu import embedding as emb
        col = self.by_column[column]
        var = col["embedding_var_keys"][0][:-len("-keys")].split("/part_")[0]
        t = self.tables[var]
        if self.quantize:
            # int8 tables: 4x less HBM, lookups dequantize on the fly;
            # shard lists route by key % N like the f32 path
            from tfplus_tpu.kv import quant
            ids64 = np.asarray(ids, np.int64)
            if isinstance(t, list):
                out = np.zeros((len(ids64), t[0].dim), np.float32)
                for s_i, shard in enumerate(t):
                    sel = (ids64.astype(np.uint64)
                           % np.uint64(len(t))) == s_i
                    if sel.any():
                        q = kv.encode_ids_np_to_device(ids64[sel])
                        out[sel] = np.asarray(
                            quant.lookup_or_zeros(shard, q))
                return out
            q = kv.encode_ids_np_to_device(ids64)
            return np.asarray(quant.lookup_or_zeros(t, q))
        # partitioned_lookup handles single tables AND shard lists (key % N
        # routing, the reference's PartitionedVariable read path)
        rows, _ = emb.partitioned_lookup(t, np.asarray(ids, np.int64),
                                         train=False)
        return np.asarray(rows)


def make_handler(server):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse
            u = urlparse(self.path)
            if u.path == "/signature":
                return self._json(server.metadata.generate_signature())
            if u.path == "/embed":
                qs = parse_qs(u.query)
                col = qs.get("column", [""])[0]
                ids = [int(x) for x in qs.get("ids", [""])[0].split(",") if x]
                if col not in server.by_column:
                    return self._json({"error": f"unknown column {col}"}, 404)
                rows = server.embed(col, ids)
                return self._json({"column": col, "ids": ids,
                                   "embeddings": rows.tolist()})
            return self._json({"error": "use /signature or /embed"}, 404)
    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--port", type=int, default=8571)
    ap.add_argument("--serve", action="store_true",
                    help="stay up instead of running the self-test")
    ap.add_argument("--quantize", action="store_true",
                    help="serve int8 row-quantized tables (4x less HBM)")
    ap.add_argument("--sharded", action="store_true",
                    help="serve from a device MESH (one table shard per "
                         "device, all-to-all exchange; composes with "
                         "--quantize). With --cpu, 8 fake devices")
    args = ap.parse_args()
    if args.cpu:
        if args.sharded:
            os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                       " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")

    with tempfile.TemporaryDirectory() as d:
        print("training + exporting ...")
        ref_tables = train_and_export(d)
        print("loading export in server (no templates) ...")
        server = EmbeddingServer(d, quantize=args.quantize,
                                 sharded=args.sharded)
        httpd = ThreadingHTTPServer(("127.0.0.1", args.port),
                                    make_handler(server))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{args.port}"
        sig = json.loads(urllib.request.urlopen(base + "/signature").read())
        print("signature:", sig)
        resp = json.loads(urllib.request.urlopen(
            base + "/embed?column=user&ids=1,2,3,999999").read())
        import numpy as np
        from tfplus_tpu import kv
        got = np.asarray(resp["embeddings"], np.float32)
        want = np.asarray(kv.lookup_or_zeros(
            ref_tables["user_emb"], kv.encode_ids_np_to_device(
                np.array([1, 2, 3, 999999], np.int64))))
        tol = (np.abs(want).max() / 120.0 + 1e-6) if args.quantize else 1e-6
        assert np.allclose(got, want, atol=float(tol)), \
            "served rows != trained rows"
        assert np.abs(got[-1]).sum() == 0.0, "unknown id must read zeros"
        print("self-test OK: served rows match training, unknown id -> zeros")
        if args.serve:
            print(f"serving on {base} (ctrl-c to stop)")
            t.join()
        httpd.shutdown()


if __name__ == "__main__":
    main()
