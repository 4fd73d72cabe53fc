"""TupleState: a fixed tuple of sketches merged element-wise — build several
sketches in ONE pass over the data under the same UDAF harness (the ad-hoc
composite state/websketch.py uses for the flagship build, generalized).
Merge is associative/commutative iff every component's is."""

from __future__ import annotations

from epichypersketch_jl_ray.state.base import MergeableSketch


class TupleState(MergeableSketch):
    __slots__ = ("parts",)

    def __init__(self, parts: tuple[MergeableSketch, ...]) -> None:
        self.parts = tuple(parts)

    def merge(self, other: "TupleState") -> "TupleState":
        if len(other.parts) != len(self.parts):
            raise ValueError("cannot merge TupleStates of different arity")
        for mine, theirs in zip(self.parts, other.parts):
            if type(mine) is not type(theirs):
                raise ValueError(
                    f"component type mismatch: {type(mine).__name__} vs {type(theirs).__name__}"
                )
            mine.merge(theirs)
        return self

    def _state_arrays(self) -> tuple:
        out = []
        for i, p in enumerate(self.parts):
            for name, arr in p._state_arrays():
                out.append((f"{i}:{name}", arr))
        return tuple(out)
