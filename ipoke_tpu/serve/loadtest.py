"""Load-test client for serve/server.py — saturates the server from separate
PROCESSES so client-side work does not share the GIL with request threads
(the r3 load test ran 16 urllib clients in-process and measured the client,
not the server).

    # server (synth model, real TPU):
    python -m ipoke_tpu.serve.server --synth-model iper_128 --max-batch 8 &
    # load test:
    python -m ipoke_tpu.serve.loadtest --port 8700 --requests 96 \
        --procs 2 --conns 8 --format npy_u8

Each connection is a persistent HTTP/1.1 socket (keep-alive) issuing
binary-npz requests back to back; reports served videos/s and latency
percentiles aggregated across processes.
"""
from __future__ import annotations

import argparse
import http.client
import io
import json
import multiprocessing as mp
import threading
import time

import numpy as np


def _client_proc(port, host, n_requests, n_conns, size, fmt, seed0, out_q):
    rng = np.random.default_rng(seed0)
    x0 = rng.uniform(-1, 1, (size, size, 3)).astype(np.float32)
    poke = np.zeros((size, size, 2), np.float32)
    poke[size // 2:size // 2 + 5, size // 2:size // 2 + 5] = 3.0
    body_buf = io.BytesIO()
    np.savez(body_buf, x0=x0, poke=poke, seed=np.int64(seed0),
             format=np.str_(fmt))
    body = body_buf.getvalue()
    lat, errs = [], [0]
    lock = threading.Lock()
    counter = [0]

    def worker():
        conn = http.client.HTTPConnection(host, port, timeout=600)
        while True:
            with lock:
                if counter[0] >= n_requests:
                    break
                counter[0] += 1
            t0 = time.monotonic()
            try:
                conn.request("POST", "/sample", body=body,
                             headers={"Content-Type": "application/octet-stream"})
                resp = conn.getresponse()
                data = resp.read()
                if resp.status != 200:
                    with lock:
                        errs[0] += 1
                else:
                    arr = np.load(io.BytesIO(data))
                    assert arr.ndim == 4
                    with lock:
                        lat.append(time.monotonic() - t0)
            except Exception:
                with lock:
                    errs[0] += 1
                conn.close()
                conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.close()

    threads = [threading.Thread(target=worker) for _ in range(n_conns)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out_q.put({"lat": lat, "errors": errs[0],
               "wall": time.monotonic() - t_start})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--requests", type=int, default=96,
                    help="total requests across all processes")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--conns", type=int, default=8,
                    help="persistent connections per process")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--format", default="npy_u8", choices=["npy", "npy_u8"])
    args = ap.parse_args()

    per = args.requests // args.procs
    q = mp.Queue()
    procs = [
        mp.Process(target=_client_proc,
                   args=(args.port, args.host, per, args.conns, args.size,
                         args.format, 1000 + i, q))
        for i in range(args.procs)
    ]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    lat = sorted(sum((r["lat"] for r in results), []))
    n_ok = len(lat)
    out = {
        "requests_ok": n_ok,
        "errors": sum(r["errors"] for r in results),
        "wall_s": round(wall, 2),
        "videos_per_s_served": round(n_ok / wall, 2) if wall else None,
        "p50_s": round(lat[n_ok // 2], 3) if lat else None,
        "p95_s": round(lat[int(n_ok * 0.95)], 3) if lat else None,
        "format": args.format,
        "procs": args.procs,
        "conns_per_proc": args.conns,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
