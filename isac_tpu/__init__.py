"""isac_tpu — TPU-native system-level 5G NR Integrated Sensing and Communication simulator.

A brand-new JAX/XLA/Pallas framework with the capability surface of the MATLAB
reference `xds0112/5G_based_System_level_Integrated_Sensing_and_Communication_Simulator`
(surveyed in SURVEY.md), re-designed TPU-first:

- pure-functional tensor pipelines batched over ``[cell, ue, target, slot, symbol,
  subcarrier, antenna]`` axes instead of object-per-node callback graphs;
- every 5G Toolbox primitive the reference leans on (OFDM, LDPC transport chains,
  PDSCH/PUSCH, DM-RS/CSI-RS/SRS, CDL fading, TR 38.901 pathloss, MMSE equalization,
  CQI/PMI/RI selection, CA-CFAR, MUSIC) reimplemented as jittable JAX ops;
- SPMD distribution over ``jax.sharding.Mesh`` (cells/UEs/time-blocks) in place of
  the reference's ``parfeval`` cell fan-out.

Package layout (mirrors SURVEY.md §2 component inventory):
    config/    parameter system + scenarios            (ref: +parameters, +scenarios)
    topology/  OSM city, blockages, LoS, wraparound    (ref: +networkTopology)
    ops/       PHY/sensing DSP kernel layer            (ref: 5G Toolbox + +sensing math)
    phy/       PDSCH/PUSCH chains, abstract PHY        (ref: +communication/+phyLayer)
    mac/       scheduler, HARQ, LCP, MAC PDUs          (ref: +communication/+macLayer, +scheduling, +harq)
    rlc/       RLC UM/AM entities                      (ref: +communication/+rlcLayer)
    app/       traffic models, packet distribution     (ref: +communication/+appLayer)
    sensing -> ops/sensing + sim wiring                (ref: +sensing)
    sim/       cell/network simulation engine          (ref: +simulation)
    parallel/  mesh + sharding helpers                 (ref: parfeval equivalent)
    metrics/   KPIs, loggers, visualization data       (ref: +visualizationTools, loggers)

Note on naming: the distribution name is the full reference-derived
``5g_based_system_level_integrated_sensing_and_communication_simulator_tpu``; the
import name is ``isac_tpu`` because a Python identifier cannot start with a digit.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """Persist XLA executables across processes (ISAC_TPU_NO_COMPILE_CACHE=1
    disables). Grant-layout kernels are compiled per (n_prb, mcs, rank)
    signature; the cache makes repeated runs and the test suite pay that cost
    once per machine instead of once per process."""
    import os

    if os.environ.get("ISAC_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
        # TPU-ONLY, like utils/compcache.py: XLA:CPU persists AOT machine
        # code keyed WITHOUT host CPU features, so a cache written on one
        # machine SEGFAULTS inside compilation_cache.get_executable_and_time
        # when deserialized on another (observed r5: the r4-written
        # ~/.cache/isac_tpu_xla entries crashed the CPU test suite on a new
        # host — cpu_aot_loader had warned "could lead to ... SIGILL").
        # Checked WITHOUT jax.default_backend(): that would initialize the
        # backend at import time and break jax.distributed.initialize() in
        # multi-process workers (tools/mp_worker.py).
        plats = str(jax.config.jax_platforms
                    or os.environ.get("JAX_PLATFORMS", ""))
        if not any(p in ("tpu", "axon") for p in plats.split(",")):
            return
        if jax.config.jax_compilation_cache_dir is None:
            path = os.path.join(
                os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
                "isac_tpu_xla",
            )
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_persistent_compile_cache()

from isac_tpu.api import simulate  # noqa: F401
