# Pure-numpy multiprocessing probe: per-worker workload mimics the fit
# (frombuffer/copy + fft + argsort + elementwise) on private arrays.
# If THIS caps below 1.0 at 2->8 workers, the ceiling is the box
# (shared memory bus / clocks), not the Spark plan.
import multiprocessing as mp, time, sys
import numpy as np

def work(seed):
    rng = np.random.default_rng(seed)
    acc = 0.0
    for _ in range(12):
        x = rng.normal(50, 5, 200_000)
        s = np.fft.fft(x)
        o = np.argsort(-np.abs(s))
        y = np.abs(x - x.mean()) / np.abs(x)
        acc += float(y.sum()) + float(o[0])
    return acc

def run(workers, tasks):
    with mp.Pool(workers) as p:
        t0 = time.time()
        p.map(work, range(tasks))
        return time.time() - t0

if __name__ == "__main__":
    tasks = 64
    for w in (2, 8, 32):
        best = min(run(w, tasks) for _ in range(2))
        print(w, "workers:", round(best, 2), "s ->", round(tasks / best, 2), "tasks/s")
