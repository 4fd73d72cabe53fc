"""Error types (reference analogue: /root/reference/src/errors.jl:4-14)."""


class HyperSketchError(Exception):
    """Base error for the sketch engine."""


class InvalidConfigurationError(HyperSketchError):
    """Bad delta/epsilon/min_count/batch settings."""


class SchemaError(HyperSketchError):
    """Input dataset schema does not match the expected activation layout
    (reference analogue: case inference failure, /root/reference/src/record.jl:215-231)."""
