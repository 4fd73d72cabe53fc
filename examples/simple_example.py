"""Simple example: finding enriched motifs — the Ray-native mirror of
/root/reference/examples/simple_example.jl (dict in → enriched DataFrame out
→ unique-motif groupby → top-k), with the reference README's phantom
``count`` column realized as the explicit ``estimate`` column.

Run:  python examples/simple_example.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")

    from epichypersketch_jl_ray import (
        obtain_enriched_configurations,
        obtain_enriched_configurations_partitioned,
    )
    from epichypersketch_jl_ray.config import SketchConfig

    print("=" * 60)
    print("epichypersketch_jl_ray: Simple Example")
    print("=" * 60)

    # 100 sequences with 5-15 features each, features 1-20
    rng = np.random.default_rng(42)
    activation = {
        i: [
            (int(rng.integers(1, 21)), float(rng.random()))
            for _ in range(int(rng.integers(5, 16)))
        ]
        for i in range(1, 101)
    }
    lens = [len(v) for v in activation.values()]
    print(f"\nCreated {len(activation)} sequences")
    print(f"Features per sequence: {min(lens)}-{max(lens)}")

    print("\n" + "-" * 60)
    print("Finding 2-feature motifs (min_count=5)...")
    print("-" * 60)

    motifs = obtain_enriched_configurations(
        activation,
        motif_size=2,
        min_count=5,
        config=SketchConfig(batch_size=":auto"),
    )
    print(f"Found {len(motifs)} motif occurrences")

    if len(motifs):
        unique_motifs = (
            motifs.groupby(["m1", "m2"], as_index=False)
            .agg(total_count=("estimate", "first"))
            .sort_values("total_count", ascending=False)
        )
        print("\nTop 10 most frequent motifs:")
        print(unique_motifs.head(10).to_string(index=False))
    else:
        print("No motifs found with min_count=5")

    # Partitioned processing for variable-length sequences
    print("\n" + "=" * 60)
    print("Example: Partitioned Processing")
    print("=" * 60)

    variable = {}
    for i in range(1, 31):  # short sequences
        variable[i] = [
            (int(rng.integers(1, 16)), float(rng.random()))
            for _ in range(int(rng.integers(5, 11)))
        ]
    for i in range(31, 61):  # long sequences
        variable[i] = [
            (int(rng.integers(1, 16)), float(rng.random()))
            for _ in range(int(rng.integers(30, 51)))
        ]
    print("Created dataset with variable lengths:")
    print("  30 short sequences (5-10 features)")
    print("  30 long sequences (30-50 features)")

    # min_count=1 then filter — the reference's recommended partitioned flow
    # (here the merge barrier makes both orders equivalent; shown for parity)
    part = obtain_enriched_configurations_partitioned(
        variable,
        motif_size=2,
        partition_width=10,
        min_count=1,
        config=SketchConfig(batch_size=":auto"),
    )
    print(f"\nExtracted {len(part)} motif occurrences")
    filtered = part[part["estimate"] >= 5]
    print(f"After filtering (estimate >= 5): {len(filtered)} occurrences")
    if len(filtered):
        top = (
            filtered.groupby(["m1", "m2"], as_index=False)
            .agg(total_count=("estimate", "first"))
            .sort_values("total_count", ascending=False)
        )
        print("\nTop 5 motifs:")
        print(top.head(5).to_string(index=False))

    print("\n" + "=" * 60)
    print("Done!")
    print("=" * 60)
    ray.shutdown()


if __name__ == "__main__":
    main()
