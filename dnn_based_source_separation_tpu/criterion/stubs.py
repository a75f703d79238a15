"""Stub criteria, documented as such (matching the reference's stubs).

The reference ships these unimplemented: MixIT (`src/criterion/mixit.py:4-9`
raises NotImplementedError), HungarianLoss (`src/criterion/hungarian.py:8-13`)
and ProbPIT (`src/criterion/pit.py:215`). They are declared here so API
surface parity is explicit; calling them raises with the same intent.
"""
from __future__ import annotations


class MixITLoss:
    """Mixture-invariant training loss (unimplemented in the reference)."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("MixIT is a stub in the reference (src/criterion/mixit.py:4-9).")


class HungarianLoss:
    """Hungarian-assignment PIT (unimplemented in the reference)."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("HungarianLoss is a stub in the reference (src/criterion/hungarian.py:8-13).")


class ProbPIT:
    """Probabilistic PIT (unimplemented in the reference, pit.py:215)."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("ProbPIT is a stub in the reference (src/criterion/pit.py:215-225).")
