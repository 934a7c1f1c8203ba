"""Signature-based kwargs routing.

The reference configures everything through plain function kwargs routed by
signature introspection (``src/primate/typing.py:5-14``); string-registered
criteria / pdfs are constructed from whichever subset of ``**kwargs`` their
constructors accept.  This module provides the same two routing operations
plus a combined splitter, built on a cached signature probe that understands
``**kwargs``-accepting callables (which must receive everything).
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Mapping


@functools.lru_cache(maxsize=256)
def _accepted_names(fun: Callable) -> frozenset | None:
	"""Parameter names ``fun`` accepts, or ``None`` if it takes ``**kwargs``.

	``None`` signals "accepts anything": routing then forwards the full dict.
	Unhashable / signature-less callables degrade to accepting nothing.
	"""
	try:
		sig = inspect.signature(fun)
	except (TypeError, ValueError):  # builtins, some C callables
		return frozenset()
	names = []
	for p in sig.parameters.values():
		if p.kind is inspect.Parameter.VAR_KEYWORD:
			return None
		if p.kind not in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.POSITIONAL_ONLY):
			# POSITIONAL_ONLY params cannot legally be passed as keywords —
			# routing them would make fun(**taken) raise TypeError.
			names.append(p.name)
	return frozenset(names)


def split_kwargs(fun: Callable, kwargs: Mapping[str, Any]) -> tuple[dict, dict]:
	"""Partition ``kwargs`` into (accepted-by-``fun``, everything-else)."""
	try:
		names = _accepted_names(fun)
	except TypeError:  # unhashable callable: probe without the cache
		names = _accepted_names.__wrapped__(fun)
	if names is None:
		return dict(kwargs), {}
	taken, rest = {}, {}
	for key, val in kwargs.items():
		(taken if key in names else rest)[key] = val
	return taken, rest


def restrict_kwargs(fun: Callable, kwargs: Mapping[str, Any]) -> dict:
	"""The subset of ``kwargs`` that ``fun``'s signature accepts."""
	return split_kwargs(fun, kwargs)[0]


def setdiff_kwargs(f: Callable, kwargs: Mapping[str, Any]) -> dict:
	"""The subset of ``kwargs`` that ``f``'s signature does NOT accept."""
	return split_kwargs(f, kwargs)[1]
