"""Stub criteria, documented as such (matching the reference's stubs).

The reference ships these unimplemented: MixIT (`src/criterion/mixit.py:4-9`
raises NotImplementedError), HungarianLoss (`src/criterion/hungarian.py:8-13`)
and ProbPIT (`src/criterion/pit.py:215`). They are declared here so API
surface parity is explicit; calling them raises with the same intent.

MixIT is FULLY IMPLEMENTED in `criterion/mixit.py` (beyond the reference);
the `MixITLoss` name below stays as the stub-parity alias pointing there.
"""
from __future__ import annotations


class MixITLoss:
    """Stub-parity alias: the real implementation is `criterion.mixit.MixIT`."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            "MixIT is a stub in the reference (src/criterion/mixit.py:4-9); "
            "this framework implements it fully — use "
            "dnn_based_source_separation_tpu.criterion.MixIT instead.")


class HungarianLoss:
    """Hungarian-assignment PIT (unimplemented in the reference)."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("HungarianLoss is a stub in the reference (src/criterion/hungarian.py:8-13).")


class ProbPIT:
    """Probabilistic PIT (unimplemented in the reference, pit.py:215)."""

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("ProbPIT is a stub in the reference (src/criterion/pit.py:215-225).")
