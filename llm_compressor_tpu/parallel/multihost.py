"""Multi-host orchestration (jax.distributed) — one process per host.

The reference has no distributed runtime (SURVEY.md §2.9; accelerate layer
placement only). Here, multi-host serving/calibration initializes the JAX
distributed runtime and builds a DCN(data) x ICI(model) mesh so tensor
parallelism stays inside each host's ICI domain and only data-parallel
traffic crosses DCN.

Usage (same command on every host):

    from llm_compressor_tpu.parallel import multihost
    multihost.initialize()                       # env-driven (TPU pods) or
    multihost.initialize(coordinator="10.0.0.1:1234", num_processes=2,
                         process_id=int(os.environ["HOST_ID"]))
    mesh = multihost.make_multihost_mesh(model_axis="ici")
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..utils.logging import LOGGER


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize — env-driven on TPU pods (no args), or
    explicit coordinator for manual clusters. Safe to call once."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        LOGGER.info(f"jax.distributed: process {jax.process_index()} / "
                    f"{jax.process_count()}, {jax.local_device_count()} local devices")
    except Exception as e:  # single-process runs are fine
        LOGGER.debug(f"distributed init skipped: {e}")


def make_multihost_mesh(model_axis: str = "ici"):
    """Mesh with 'model' spanning each host's local devices (ICI) and
    'data' spanning hosts (DCN): shape (n_hosts, devices_per_host)."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n_hosts = jax.process_count()
    per_host = len(devices) // n_hosts
    # jax.devices() orders by process: host h's local devices occupy
    # [h*per_host, (h+1)*per_host) — row h of the (hosts, per_host) reshape.
    arr = devices.reshape(n_hosts, per_host)
    if model_axis == "ici":
        return Mesh(arr, ("data", "model"))
    # model across DCN: transpose so the model axis varies across hosts
    # while each column stays one host's ICI domain.
    return Mesh(arr.T, ("model", "data"))
