"""Empty-input hardening for the mixture-diagnostics family: no crash,
0 rows (the test_round3_empty_inputs.py convention)."""

import pyarrow as pa
import ray.data as rd

from raster_processor_ray.aggregate.stats import (grouped_entropy,
                                                  grouped_gini,
                                                  grouped_kl_divergence,
                                                  mutual_information)


def _empty():
    return rd.from_arrow(pa.table({"g": pa.array([], type=pa.string()),
                                   "cat": pa.array([], type=pa.string())}))


def test_mixture_diagnostics_empty(ray_session):
    assert len(grouped_entropy(_empty(), "g", "cat").to_pandas()) == 0
    assert len(grouped_gini(_empty(), "g", "cat").to_pandas()) == 0
    kl = grouped_kl_divergence(_empty(), "g", "cat").to_pandas()
    assert len(kl) == 0
    mi = mutual_information(_empty(), "g", "cat").to_pandas()
    assert len(mi) == 0
