"""Vectorized batch functions: deterministic hashing, tokenization, html
extraction, text statistics. All pure functions of their inputs (no locale,
time, or process state) so checkpoint/resume and N-vs-4N runs are
bit-reproducible (SURVEY.md §4 reproducibility row).
"""
