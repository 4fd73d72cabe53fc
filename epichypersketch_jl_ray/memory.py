"""Batch-size / memory estimation (reference /root/reference/src/memory.jl).

The reference sizes batches against a GPU/4 GB budget because its padded
RefArray + Bool selection matrices scale with C(max_len, k) per point
(/root/reference/src/memory.jl:9-31). In this engine the analogous per-row
cost is the enumeration working set: C(len, k) combinations × the hash/
feature matrices inside one map_batches call. These helpers mirror the
reference's formulas and clamps so users can size ``batch_size`` the same
way (estimate → budget → clamp [10, 10000],
/root/reference/src/memory.jl:97-148).
"""

from __future__ import annotations

import math

from epichypersketch_jl_ray.errors import InvalidConfigurationError

MIN_BATCH = 10  # /root/reference/src/memory.jl:145 clamp
MAX_BATCH = 10_000
DEFAULT_BUDGET_BYTES = 4 * 1024**3  # reference CPU default, memory.jl:121
SAFETY = 0.8  # reference safety factor, memory.jl:107-108


def comb(n: int, k: int) -> int:
    return math.comb(n, k) if n >= k else 0


def estimate_bytes_per_point(max_active_len: int, motif_size: int, *, conv: bool = False) -> int:
    """Per-sequence working-set bytes inside the enumeration stage
    (reference estimate_memory_per_batch / per-point portion,
    /root/reference/src/memory.jl:9-31): hash matrix (int64 ×
    width), feature matrix, contribution sums, per-combination row ids."""
    n_combs = comb(max_active_len, motif_size)
    width = 2 * motif_size - 1 if conv else motif_size
    per_comb = 8 * (width + motif_size + 1 + 1)  # hash + feat + contrib + row_id
    if conv:
        per_comb += 8 * (motif_size - 1 + 2)  # dists + start/end
    return n_combs * per_comb + 16 * max_active_len


def estimate_fixed_bytes(delta: float, epsilon: float, motif_size: int, *, conv: bool = False) -> int:
    """Sketch + coefficients bytes (reference estimate_fixed_memory,
    /root/reference/src/memory.jl:39-61) — int64 counters here."""
    from epichypersketch_jl_ray.state.countmin import cms_cols, cms_num_counters, cms_rows

    rows = cms_rows(delta)
    cols = cms_cols(cms_num_counters(rows, epsilon), rows)
    width = 2 * motif_size - 1 if conv else motif_size
    return rows * cols * 8 + rows * width * 8


def calculate_optimal_batch_size(
    max_active_len: int,
    motif_size: int,
    *,
    conv: bool = False,
    delta: float = 1e-4,
    epsilon: float = 5e-5,
    budget_bytes: int = DEFAULT_BUDGET_BYTES,
) -> int:
    """(budget*safety - fixed) / per_point, clamped to [10, 10000]
    (reference calculate_optimal_batch_size, /root/reference/src/memory.jl:97-148).

    Raises InvalidConfigurationError when the fixed structures alone exceed
    the budget (reference memory.jl:136-139, tested at
    /root/reference/test/test_memory_management.jl:137-142).
    """
    fixed = estimate_fixed_bytes(delta, epsilon, motif_size, conv=conv)
    usable = budget_bytes * SAFETY
    if fixed >= usable:
        raise InvalidConfigurationError(
            f"fixed sketch structures ({fixed} B) exceed memory budget ({usable:.0f} B)"
        )
    per_point = estimate_bytes_per_point(max_active_len, motif_size, conv=conv)
    raw = int((usable - fixed) // max(per_point, 1))
    return max(MIN_BATCH, min(MAX_BATCH, raw))
