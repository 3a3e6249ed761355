"""A/B the inflate decode walk on the real chip (round 5).

Runs the indexed device decode at [MiB] with the Pallas scalar-chain
walk vs the lane-parallel XLA walk (TPZ_INFLATE_WALK=vz), each in its
own subprocess (the variant is a trace-time choice). Reports warm wall
per variant. Usage: python bench/probe_inflate_ab.py [MiB]
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CODE = """
import time
from tpz.codecs import gzip_codec as gz
from tpz.utils import corpus
n = {mib} << 20
data = bytes(corpus.mixed(n, seed=9))
blob = gz.compress(data)
out = gz.decompress(blob, backend="tpu")   # cold (compile)
assert out == data
t0 = time.time()
out = gz.decompress(blob, backend="tpu")
dt = time.time() - t0
assert out == data
print(f"warm decode {{dt:.3f}}s ({{n/dt/1e6:.2f}} MB/s)", flush=True)
"""


def run(label, extra_env, mib):
    env = dict(os.environ, **extra_env)
    r = subprocess.run([sys.executable, "-u", "-c", CODE.format(mib=mib)],
                       env=env, capture_output=True, text=True,
                       timeout=3600)
    tail = (r.stdout or "").strip().splitlines()
    print(f"{label}: {tail[-1] if tail else 'no output'}"
          + ("" if r.returncode == 0 else
             f"  FAILED rc={r.returncode}: {r.stderr[-400:]}"),
          flush=True)


LZ_CODE = """
import time
from tpz.codecs import lzhuf
from tpz.utils import corpus
n = {mib} << 20
data = bytes(corpus.mixed(n, seed=9))
blob = lzhuf.compress(data, method="lh5", backend="auto")
out = lzhuf.decompress(blob, backend="tpu")   # cold (compile)
assert out == data
t0 = time.time()
out = lzhuf.decompress(blob, backend="tpu")
dt = time.time() - t0
assert out == data
print(f"warm decode {{dt:.3f}}s ({{n/dt/1e6:.2f}} MB/s)", flush=True)
"""


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    run("inflate pallas walk", {}, mib)
    run("inflate vz lane-parallel walk", {"TPZ_INFLATE_WALK": "vz"}, mib)
    global CODE
    CODE = LZ_CODE
    run("lzhuf pallas walk", {}, mib)
    run("lzhuf vz lane-parallel walk", {"TPZ_LZHUF_WALK": "vz"}, mib)


if __name__ == "__main__":
    main()
