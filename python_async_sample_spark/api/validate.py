"""Runtime argument validation for the public API — the reference's cktypes.

Reference parity: ``cktypes.checktypes`` (``cktypes.py:5-93``) wraps the
query API's entry points (``eda_query.py:163-165,180-187``) and rejects a
call whose arguments don't match the signature annotations before any work
runs. This module provides the same contract for the Spark surface, with two
deliberate differences: mismatches raise ``TypeError`` (the idiomatic Python
exception for bad argument types; the reference raised ``ValueError``), and
annotations are resolved through ``typing`` so modern forms — ``X | None``
unions, parameterized generics like ``list[str]`` (checked against their
origin class), postponed annotations — validate instead of being skipped.
"""

from __future__ import annotations

import functools
import inspect
import types
import typing
from collections.abc import Callable


def _acceptable_classes(annotation) -> tuple[type, ...] | None:
    """Concrete classes a value may be an instance of, or None if the
    annotation doesn't constrain (missing, Any, unresolvable)."""
    if annotation is inspect.Parameter.empty or annotation is typing.Any:
        return None
    origin = typing.get_origin(annotation)
    if origin is typing.Union or origin is types.UnionType:
        out: list[type] = []
        for arm in typing.get_args(annotation):
            got = _acceptable_classes(arm)
            if got is None:
                return None  # one unconstrained arm accepts everything
            out.extend(got)
        return tuple(out)
    if annotation is None or annotation is type(None):
        return (type(None),)
    if origin is not None:  # list[str] etc. — isinstance against the origin
        return (origin,) if inspect.isclass(origin) else None
    return (annotation,) if inspect.isclass(annotation) else None


def checked(func: Callable) -> Callable:
    """Validate call arguments against ``func``'s annotations at call time.

    Like the reference decorator: defaults are vetted at decoration time,
    ``*args``/``**kwargs`` are vetted element-wise, and the error names the
    function, the argument, the expected type and the received type.
    """
    sig = inspect.signature(func)
    hints = typing.get_type_hints(func)

    expected: dict[str, tuple[type, ...]] = {}
    for name, param in sig.parameters.items():
        classes = _acceptable_classes(hints.get(name, inspect.Parameter.empty))
        if classes is None:
            continue
        expected[name] = classes
        if param.default is not inspect.Parameter.empty and not isinstance(
            param.default, classes
        ):
            raise TypeError(
                f"{func.__qualname__}: default for {name!r} is not {hints[name]!r}"
            )

    def _check(arg_name: str, classes: tuple[type, ...], value) -> None:
        if not isinstance(value, classes):
            names = " | ".join(c.__name__ for c in classes)
            raise TypeError(
                f"{func.__qualname__}: wrong type of {arg_name!r} argument, "
                f"{names!r} expected, got {type(value).__name__!r}"
            )

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        for name, value in bound.arguments.items():
            classes = expected.get(name)
            if classes is None:
                continue
            kind = sig.parameters[name].kind
            if kind is inspect.Parameter.VAR_POSITIONAL:
                for v in value:
                    _check(name, classes, v)
            elif kind is inspect.Parameter.VAR_KEYWORD:
                for sub, v in value.items():
                    _check(f"{name}:{sub}", classes, v)
            else:
                _check(name, classes, value)
        return func(*bound.args, **bound.kwargs)

    return wrapper
