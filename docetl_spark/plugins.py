"""Operator plugins: extend the pipeline compiler with custom op types.

Reference semantics: /root/reference/docetl/operations/__init__.py:54-76
— unknown operation types are resolved through the
``docetl.operation`` entry-point group before the built-in mapping, so
third-party packages can ship operators. Here the analogous group is
``docetl_spark.operators`` plus an in-process ``register_operator`` API
(tests and notebooks shouldn't need a package install to add one).

A plugin operator is a callable::

    def my_op(sf: SemanticFrame, config: dict, datasets: dict) -> SemanticFrame

invoked by the compiler when it encounters ``type: <name>`` it doesn't
know. Entry points are resolved lazily and cached; explicit
registrations win over entry points (closer to the caller).
"""

from __future__ import annotations

from typing import Callable

_registry: dict[str, Callable] = {}
_entry_points_loaded = False


def register_operator(name: str, fn: Callable) -> None:
    """Register ``fn`` as the handler for op ``type: name``."""
    if not callable(fn):
        raise TypeError("operator plugin must be callable")
    _registry[name] = fn


def unregister_operator(name: str) -> None:
    _registry.pop(name, None)


def _load_entry_points() -> None:
    global _entry_points_loaded
    if _entry_points_loaded:
        return
    _entry_points_loaded = True
    try:
        from importlib.metadata import entry_points

        for ep in entry_points(group="docetl_spark.operators"):
            # explicit registrations win: don't clobber
            _registry.setdefault(ep.name, ep.load())
    except Exception:  # noqa: BLE001 — a broken plugin must not kill the engine
        pass


def get_operator(name: str) -> Callable | None:
    """Resolve a plugin operator, or None when unknown."""
    if name in _registry:
        return _registry[name]
    _load_entry_points()
    return _registry.get(name)
