"""Parameter files: YAML + physical units + used-value tracking.

Equivalent of the reference's ParameterFile/YAMLDictionary
(/root/reference/src/ParameterFile.hpp:103-160,
/root/reference/src/YAMLDictionary.hpp): values are addressed by
colon-separated paths ("SimulationBox:anchor"), may carry unit strings
("5. pc", "100. cm^-3"), every read records the value actually used
(including defaults) so the effective configuration can be dumped
(cf. the `.used-values` dump at
/root/reference/src/IonizationSimulation.cpp:218-226).

Uses PyYAML for the document structure; scalar coercion (ints, floats in
"1e6" form, booleans, unit quantities) happens at access time, matching the
reference's typed `get_value<T>` semantics.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import yaml

from cmacionize_tpu.utils.units import parse_quantity

_MISSING = object()


def _coerce_number(value: Any) -> float:
    """Coerce YAML scalars to float, accepting "1e6"-style strings that
    YAML 1.1 parses as strings."""
    if isinstance(value, bool):
        raise ValueError(f"expected a number, got boolean {value!r}")
    if isinstance(value, (int, float)):
        return float(value)
    return float(str(value).strip())


def _coerce_bool(value: Any) -> bool:
    if isinstance(value, bool):
        return value
    text = str(value).strip().lower()
    if text in ("true", "yes", "on", "y", "1"):
        return True
    if text in ("false", "no", "off", "n", "0"):
        return False
    raise ValueError(f"cannot interpret {value!r} as a boolean")


class ParameterFile:
    """Typed, unit-aware access to a YAML parameter tree."""

    def __init__(self, source: Union[str, dict, None] = None):
        self.checksum = None
        if source is None:
            self._tree: dict = {}
            self.filename = None
        elif isinstance(source, dict):
            self._tree = source
            self.filename = None
        else:
            self.filename = source
            with open(source, "r") as handle:
                raw = handle.read()
            self._tree = yaml.safe_load(raw) or {}
            # input provenance: the reference logs an MD5 checksum of every
            # parameter file it reads (ParameterFile.hpp:179, MD5Sum.hpp)
            import hashlib

            self.checksum = hashlib.md5(raw.encode()).hexdigest()
        # path -> value actually used (after defaults), for the used-values dump
        self._used: dict = {}

    # ------------------------------------------------------------------ raw
    def _lookup(self, path: str):
        node = self._tree
        for part in path.split(":"):
            if not isinstance(node, dict) or part not in node:
                return _MISSING
            node = node[part]
        return node

    def has_value(self, path: str) -> bool:
        return self._lookup(path) is not _MISSING

    # ---------------------------------------------------------------- typed
    def get_value(self, path: str, default: Any = _MISSING) -> Any:
        """Raw value (string/number/bool/list) with default recording."""
        value = self._lookup(path)
        if value is _MISSING:
            if default is _MISSING:
                raise KeyError(f"parameter {path!r} not found and no default given")
            value = default
        self._used[path] = value
        return value

    def get_string(self, path: str, default: Any = _MISSING) -> str:
        return str(self.get_value(path, default))

    def get_number(self, path: str, default: Any = _MISSING) -> float:
        return _coerce_number(self.get_value(path, default))

    def get_int(self, path: str, default: Any = _MISSING) -> int:
        return int(self.get_number(path, default))

    def get_bool(self, path: str, default: Any = _MISSING) -> bool:
        return _coerce_bool(self.get_value(path, default))

    def get_physical_value(
        self,
        path: str,
        quantity: Optional[str] = None,
        default: Any = _MISSING,
    ) -> float:
        """Value with units → SI float. ``default`` may itself carry units."""
        value = self.get_value(path, default)
        return parse_quantity(value, quantity)

    def get_physical_vector(
        self,
        path: str,
        quantity: Optional[str] = None,
        default: Any = _MISSING,
    ) -> Sequence[float]:
        value = self.get_value(path, default)
        if isinstance(value, str):
            value = [part.strip() for part in value.strip("[]").split(",")]
        return [parse_quantity(component, quantity) for component in value]

    def get_int_vector(self, path: str, default: Any = _MISSING):
        value = self.get_value(path, default)
        return [int(_coerce_number(component)) for component in value]

    def get_bool_vector(self, path: str, default: Any = _MISSING):
        value = self.get_value(path, default)
        return [_coerce_bool(component) for component in value]

    # ------------------------------------------------------------ used dump
    def used_values(self) -> dict:
        return dict(self._used)

    def write_used_values(self, filename: str) -> None:
        """Dump the effective configuration (every value read, incl. defaults)."""
        tree: dict = {}
        for path, value in sorted(self._used.items()):
            node = tree
            parts = path.split(":")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = value
        with open(filename, "w") as handle:
            yaml.safe_dump(tree, handle, default_flow_style=False, sort_keys=True)
