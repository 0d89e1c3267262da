"""Decorators: runtime type assertion and wall-clock timing.

Capability parity with reference skrec/utils/py/decorator.py:13-51.
"""
import functools
import inspect
import time

__all__ = ["typeassert", "timer"]


def typeassert(*type_args, **type_kwargs):
    """Assert argument types at call time.

    Usage::

        @typeassert(x=int, y=(int, float))
        def f(x, y): ...
    """

    def decorate(func):
        sig = inspect.signature(func)
        bound_types = sig.bind_partial(*type_args, **type_kwargs).arguments

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            bound_values = sig.bind(*args, **kwargs)
            for name, value in bound_values.arguments.items():
                if name in bound_types and value is not None:
                    if not isinstance(value, bound_types[name]):
                        raise TypeError(
                            f"Argument '{name}' must be {bound_types[name]}, "
                            f"got {type(value).__name__}")
            return func(*args, **kwargs)

        return wrapper

    return decorate


def timer(func):
    """Print the wall time of each call."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = func(*args, **kwargs)
        elapsed = time.perf_counter() - start
        print(f"{func.__name__} took {elapsed:.4f}s")
        return result

    return wrapper
