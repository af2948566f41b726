"""Estimator base class — the reference's scikit-style introspection surface
(``mercury/graph/core/base.py:4-45`` ``BaseClass``): every trainer exposes
``get_params()`` (constructor-parameter dict via signature inspection),
``repr(obj)`` as ``ClassName(k=v, ...)``, and a multi-line ``str(obj)`` that
appends the fitted attributes (``*_``) once ``fit`` has run.

Written from scratch against that public API shape; the implementation is
not a copy (fitted-attribute discovery and the sorted-params contract are
this engine's)."""

from __future__ import annotations

import inspect


class BaseEstimator:
    def get_params(self) -> dict:
        """Constructor parameters as {name: current value}, sorted by name
        (base.py:26-45 semantics: names from the __init__ signature, values
        from same-named attributes)."""
        sig = inspect.signature(self.__init__)
        names = sorted(p for p in sig.parameters if p != "self")
        out = {}
        for k in names:
            default = sig.parameters[k].default
            sentinel = object()
            v = getattr(self, k, sentinel)
            if v is sentinel:
                # constructor params consumed without storage (e.g. an RNG
                # seed) report their signature default
                v = None if default is inspect.Parameter.empty else default
            out[k] = v
        return out

    def _fitted_attrs(self) -> list[str]:
        return sorted(
            k for k in vars(self)
            if k.endswith("_") and not k.startswith("_")
        )

    def __repr__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in self.get_params().items())
        return f"{type(self).__name__}({params})"

    def __str__(self) -> str:
        params = ", ".join(f"{k}={v!r}" for k, v in self.get_params().items())
        lines = [
            f"Object of class {type(self).__name__}.",
            "",
            f"Initialization parameters: {params}",
        ]
        fitted = self._fitted_attrs()
        if fitted:
            lines += ["", f"State attributes: {', '.join(fitted)}"]
        return "\n".join(lines)
