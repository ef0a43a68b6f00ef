import sys, time
sys.path.insert(0, "/root/repo")
import multiprocessing as mp

ENC = "/dev/shm/arcade_read_scaling_4000000"
RAW = 2402542806

def decode_parts(pids):
    from arcade_spark.partread import _scan_part_batches, load_manifest
    cols, _ = load_manifest(ENC)
    n = 0
    for pid in pids:
        for b in _scan_part_batches(ENC, pid, cols, False):
            n += b.num_rows
    return n

def run(nproc, pids, reps=3):
    best = 1e9
    for _ in range(reps):
        chunks = [pids[i::nproc] for i in range(nproc)]
        t0 = time.time()
        if nproc == 1:
            total = decode_parts(pids)
        else:
            with mp.get_context("fork").Pool(nproc) as pool:
                total = sum(pool.map(decode_parts, chunks))
        dt = time.time() - t0
        assert total == 4000000, total
        best = min(best, dt)
    return best

if __name__ == "__main__":
    from arcade_spark.partread import load_manifest
    _cols, parts = load_manifest(ENC)
    pids = [p for p, _ in parts]
    t1 = run(1, pids)
    t4 = run(4, pids)
    print(f"kernel-only decode: 1 proc {t1:.2f}s ({RAW/t1/1e9:.3f} GB/s), "
          f"4 procs {t4:.2f}s ({RAW/t4/1e9:.3f} GB/s), "
          f"efficiency {t1/(4*t4):.3f}")
