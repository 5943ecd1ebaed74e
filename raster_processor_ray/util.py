"""Engine-wide execution helpers."""

from __future__ import annotations


def actor_pool_size(num_cpus: float = 0.5, *, floor: int = 2,
                    cap: int | None = None) -> tuple[int, int]:
    """Autoscaling ``(min, max)`` bounds for an actor-pool ``map_batches``.

    A fixed pool size (the old ``concurrency=2``) is a single-node tuning
    leak: on a large cluster a hard cap of two actors starves every stage
    downstream of it no matter how many nodes exist. Instead size the max
    from the cluster's CPU count divided by the per-actor ``num_cpus``
    reservation, so the pool *can* cover the cluster; the streaming
    executor's backpressure decides how many actors actually spawn, and
    ``min=1`` keeps tiny inputs from paying actor-startup cost.
    """
    try:
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 0))
                if ray.is_initialized() else 0)
    except Exception:  # pragma: no cover - ray import/cluster query failure
        cpus = 0
    if cpus <= 0:
        import os

        cpus = os.cpu_count() or 8
    hi = max(floor, int(cpus / max(num_cpus, 1e-9)))
    if cap is not None:
        hi = min(hi, cap)
    return (1, hi)


def pin_for_shuffle(ds):
    """Materialize a dataset that is about to feed a sort-based groupby.

    Ray's sort-based shuffle samples partition boundaries from its input;
    when the input is a LAZY map chain, the chain fuses into the shuffle
    and executes once for the sampling pass and again for the shuffle map
    — an expensive upstream runs TWICE (measured: 2.2x flagship wall time
    at num_cpus=4, 381s lazy vs 180s pinned for the identical DAG).

    An all-to-all materializes its entire input in the object store
    regardless, so pinning changes peak memory by nothing and halves the
    compute. Use before every ``groupby`` whose upstream does real work.
    """
    return ds.materialize()
