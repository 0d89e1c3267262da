"""Typed config system.

Capability parity with the reference config stack
(skrec/utils/py/config.py:15-96, skrec/utils/common.py:43-48), re-designed:

* ``Config`` — ordered attribute namespace whose ``__init__`` consumes known
  keyword arguments and then runs ``_validate()`` automatically (the reference
  achieves this with a ``PostInitMeta`` metaclass; we do it directly in
  ``__init_subclass__``-free plain code for clarity).
* ``ModelConfig.param_space()`` — declares the hyper-parameter grid consumed
  by the search driver; ``num_combos()`` is the product of grid sizes.
* ``merge_config_with_cmd_args`` — overlay ``--key value`` CLI pairs. The
  reference uses ``eval()`` on values (config.py:80-90); we use
  ``ast.literal_eval`` with a string fallback — a conscious, documented fix
  (SURVEY §7.4) that removes arbitrary-code-execution while keeping the same
  accepted syntax for ints/floats/tuples/lists/bools.
* ``merge_config_with_ini`` — ini-file overlay. The reference README
  advertises ini parsing but the code lacks it (SURVEY §5.6); restored here.
"""
import ast
import configparser
import sys
from collections import OrderedDict
from typing import Any, Dict, List, Optional

__all__ = ["Config", "ModelConfig", "merge_config_with_cmd_args",
           "merge_config_with_ini", "parse_value"]


def parse_value(text: str) -> Any:
    """Parse a CLI/ini value into a Python literal, falling back to str.

    Ini-conventional lowercase booleans ('true'/'false', any case) parse as
    bool — ast.literal_eval only accepts the Python spellings, and a truthy
    string "false" would silently flip flags like hyperopt/resume.
    """
    if text.strip().lower() in ("true", "false"):
        return text.strip().lower() == "true"
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


class Config:
    """Ordered attribute namespace with post-init validation."""

    def __init__(self, **kwargs):
        self._ordered_keys: List[str] = []
        for key, value in kwargs.items():
            if not hasattr(type(self), key) and key not in self.__dict__:
                # Unknown keys are ignored (the reference tolerates extra
                # kwargs so one flat CLI dict can feed RunConfig + ModelConfig).
                continue
            setattr(self, key, value)
        self.__post_init__()

    def __post_init__(self):
        self._validate()

    def _validate(self):
        pass

    def __setattr__(self, key, value):
        if key != "_ordered_keys" and not key.startswith("_"):
            keys = self.__dict__.setdefault("_ordered_keys", [])
            if key not in keys:
                keys.append(key)
        super().__setattr__(key, value)

    def to_dict(self) -> "OrderedDict[str, Any]":
        """All public attributes (class defaults overridden by instance)."""
        out: "OrderedDict[str, Any]" = OrderedDict()
        for klass in reversed(type(self).__mro__):
            for key, value in vars(klass).items():
                if key.startswith("_") or callable(value) or isinstance(value, (property, classmethod, staticmethod)):
                    continue
                out[key] = value
        for key in self.__dict__.get("_ordered_keys", []):
            out[key] = getattr(self, key)
        return out

    def to_string(self, sep: str = ", ") -> str:
        """``key=value`` pairs joined by ``sep`` (used for run-id slugs and
        hyper-parameter log blocks, reference base.py:40, :57)."""
        return sep.join(f"{k}={v}" for k, v in self.to_dict().items())

    def __str__(self):
        items = ", ".join(f"{k}={v!r}" for k, v in self.to_dict().items())
        return f"{type(self).__name__}({items})"

    __repr__ = __str__


class ModelConfig(Config):
    """Per-model hyper-parameter config with an optional search grid."""

    # Universal TPU knob: cap on lax.scan length per compiled epoch program
    # (None = whole epoch in one program; set e.g. 64 for very heavy steps —
    # see skrx/models/pipeline.py).
    max_scan_steps = None

    @classmethod
    def param_space(cls) -> Dict[str, list]:
        """Hyper-parameter grid for the search driver. Empty disables search
        (reference: config.py:52-63, hyperopt.py:22)."""
        return {}

    @classmethod
    def num_combos(cls) -> int:
        n = 1
        for values in cls.param_space().values():
            n *= max(len(values), 1)
        return n


def merge_config_with_cmd_args(config: Dict[str, Any],
                               argv: Optional[List[str]] = None) -> Dict[str, Any]:
    """Overlay ``--key value`` pairs from argv onto a config dict.

    Mirrors the reference CLI contract (config.py:66-96): every flag must be
    of the form ``--key value``; values are literal-parsed.
    """
    args = sys.argv[1:] if argv is None else list(argv)
    if len(args) % 2 != 0:
        raise SyntaxError("The numbers of arguments and values are not equal.")
    out = dict(config)
    for flag, value in zip(args[0::2], args[1::2]):
        if not flag.startswith("--"):
            raise SyntaxError(f"Arguments must start with '--': {flag!r}")
        out[flag[2:]] = parse_value(value)
    return out


def merge_config_with_ini(config: Dict[str, Any], ini_path: str,
                          sections: Optional[List[str]] = None) -> Dict[str, Any]:
    """Overlay key/value pairs from an ini file onto a config dict.

    All sections are merged in file order unless ``sections`` is given.
    Restores the ini capability advertised by the reference README (README:11)
    but absent from its code.
    """
    parser = configparser.ConfigParser()
    read = parser.read(ini_path)
    if not read:
        raise FileNotFoundError(ini_path)
    out = dict(config)
    for section in (sections if sections is not None else parser.sections()):
        for key, value in parser.items(section):
            out[key] = parse_value(value)
    return out
