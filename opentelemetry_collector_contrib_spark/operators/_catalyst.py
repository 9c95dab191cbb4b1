"""Shared Catalyst-hazard helpers (see PLANS.md session-15 addendum and
the project memory note: chained map/array pipelines must bind their
working column once per stage or project collapsing re-inlines the
upstream expression per reference — multiplicative plan growth)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Bind ``col`` as a higher-order-function lambda variable so ``fn``
    may reference it any number of times while the upstream expression
    appears exactly once in the plan. Lambda-variable references are
    leaf nodes Catalyst never expands, so chained stages grow additively
    instead of multiplicatively (measured 60× on a 9-stage chain)."""
    return F.element_at(F.transform(F.array(col), fn), 1)
