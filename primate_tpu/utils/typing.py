"""Signature-based kwargs routing helpers.

Parity: reference `src/primate/typing.py:5-14` (restrict_kwargs / setdiff_kwargs).
These power the kwarg-first configuration style of the estimator entry points:
string-registered criteria / pdfs are constructed from the subset of ``**kwargs``
their constructors accept.
"""

import inspect
from typing import Callable


def restrict_kwargs(fun: Callable, kwargs: dict) -> dict:
	"""Restrict ``kwargs`` to keys that are parameters of ``fun``."""
	valid = set(inspect.signature(fun).parameters)
	return {k: v for k, v in kwargs.items() if k in valid}


def setdiff_kwargs(f: Callable, kwargs: dict) -> dict:
	"""Return the subset of ``kwargs`` that are NOT parameters of ``f``."""
	valid = set(inspect.signature(f).parameters)
	return {k: kwargs[k] for k in set(kwargs) - valid}
