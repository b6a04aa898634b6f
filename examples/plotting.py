"""Plot demo — the equivalent of the reference's examples/plotting.rs:
seeded noise through all five plots (constellation, time, compare,
spectrum, waterfall). Writes PNGs to the given prefix (default /tmp/aeth).

Run: python examples/plotting.py [prefix]
"""

import sys

import numpy as np



def main():
    import jax

    # demos use eager complex ops, which cannot cross the host<->device
    # boundary on TPU runtimes without complex transfer (DEVNOTES.md) —
    # run on CPU unless the user opts in with --tpu
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from aether_primitives_tpu.ops import noise
    from aether_primitives_tpu.utils import plot

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    prefix = pos[0] if pos else "/tmp/aeth"
    gen = noise.new(1.0, 815)

    print("Generating noise and plotting constellation")
    plot.constellation(np.asarray(gen.fill(2048)), "2048 Noise Values", f"{prefix}_constellation.png")

    print("Generating noise and plotting time signal")
    plot.time(np.asarray(gen.fill(200)), "200 Noise Values", f"{prefix}_time.png")

    print("Generating noise and plotting comparison")
    nv = np.asarray(gen.fill(400))
    plot.compare(nv[:200], nv[200:], "200 Noise Values", f"{prefix}_compare.png")

    print("Generating noise and plotting spectrum")
    plot.spectrum(np.asarray(gen.fill(2048)), 2048, True, "Noise Spectrum", f"{prefix}_spectrum.png")

    print("Generating noise and waterfall (500 x 2048)")
    cap = np.asarray(gen.fill(2048 * 500))
    plot.waterfall(cap, 2048, True, "500*2048 Noise Values", f"{prefix}_waterfall.png")
    print(f"Wrote plots with prefix {prefix}_")


if __name__ == "__main__":
    main()
