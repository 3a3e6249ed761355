"""A/B the deflate parse walks on the real chip (round 5, VERDICT item 5).

Times stage 1 (screen + parse + histograms, fetch-synced) of the device
DEFLATE encode with the scalar-chain Pallas walk (v3y) vs the
lane-parallel vectorized walk (v3z) at the same input, plus the full
compress() wall time for each. Usage: python bench/probe_parse_ab.py [MiB].
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_compress(data, label):
    from tpz.codecs.deflate import DeflateConfig
    from tpz.kernels import deflate_pipeline as dp
    from tpz.utils import corpus

    cfg = DeflateConfig(level=6)
    out = dp.compress(data, cfg)  # cold (compile)
    t0 = time.time()
    out = dp.compress(bytes(corpus.mixed(len(data), seed=77)), cfg)
    dt = time.time() - t0
    print(f"{label}: warm compress {dt:.3f}s "
          f"({len(data)/dt/1e6:.2f} MB/s), out={len(out)}", flush=True)
    return dt


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print("devices:", jax.devices(), flush=True)
    from tpz.utils import corpus

    data = bytes(corpus.mixed(mib << 20, seed=41))

    only = os.environ.get("TPZ_AB_ONLY")  # "v3y" | "v3z" | unset (both)
    t_y = t_z = None
    if only in (None, "v3y"):
        os.environ["TPZ_PARSE"] = "v3y"
        t_y = time_compress(data, "v3y scalar-chain walk")
    if only in (None, "v3z"):
        os.environ["TPZ_PARSE"] = "v3z"
        t_z = time_compress(data, "v3z lane-parallel walk")
    if t_y and t_z:
        print(f"speedup v3z/v3y: {t_y / t_z:.2f}x", flush=True)


if __name__ == "__main__":
    main()
