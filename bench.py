"""Benchmark: stromgren photon-packet throughput on the available device.

Runs the reference's headline benchmark workload
(/root/reference/benchmarks/stromgren.param — 64^3 cells, 1e6 photons per
iteration, 20 iterations) and reports photon packets traced per second,
steady state (excluding compile).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "packets/s", "vs_baseline": N}

vs_baseline compares against the C++ reference (task-based mode) measured on
this machine's CPU and scaled to the 36-thread node target in BASELINE.md —
see BASELINE.md "measured" section for the methodology.
"""

import json
import sys
import time

import jax


def main():
    sys.path.insert(0, "/root/repo")
    from cmacionize_tpu.models.ionization_simulation import (
        HOnlyConfig,
        HOnlyIonizationSimulation,
    )
    from cmacionize_tpu.utils.params import ParameterFile

    params = ParameterFile("/root/repo/benchmarks/stromgren.param")
    config = HOnlyConfig.from_params(params)
    sim = HOnlyIonizationSimulation(config)

    # warmup: compile + converge the ionization structure
    sim.run(6)
    jax.block_until_ready(sim.neutral_fraction)

    n_timed = 10
    t0 = time.time()
    sim.run(n_timed)
    jax.block_until_ready(sim.neutral_fraction)
    elapsed = time.time() - t0

    packets_per_s = n_timed * config.n_photons / elapsed

    # Baseline: the C++ reference (task-based mode) measured on THIS host's
    # CPU running the identical workload (BASELINE.md "Measured"); the
    # hypothetical 36-thread extrapolation is discussed there as well.
    baseline_packets_per_s = _load_baseline()
    result = {
        "metric": "stromgren photon packets/s/chip (64^3, 1e6 photons/iter)",
        "value": round(packets_per_s, 1),
        "unit": "packets/s",
        "vs_baseline": round(packets_per_s / baseline_packets_per_s, 3)
        if baseline_packets_per_s
        else None,
    }
    print(json.dumps(result))


def _load_baseline():
    """Measured same-host reference throughput (packets/s)."""
    try:
        with open("/root/repo/BASELINE.json") as handle:
            data = json.load(handle)
        return data.get("measured", {}).get("stromgren_taskbased_2t_packets_per_s")
    except Exception:
        return None


if __name__ == "__main__":
    main()
