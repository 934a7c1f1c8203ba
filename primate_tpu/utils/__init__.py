"""Utility helpers: kwargs routing, misc glue."""

from .kwargs import restrict_kwargs, setdiff_kwargs

__all__ = ["restrict_kwargs", "setdiff_kwargs"]
