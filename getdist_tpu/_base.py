"""Backwards-compatibility attribute shim.

Maps legacy camelCase attribute names onto snake_case ones with deprecation
warnings, and supports per-class ``_deprecated`` rename tables (reference
``getdist/_base.py``). Used by the plot settings/plotter classes so old
getdist scripts keep working.
"""

import logging
import re

_CAMEL_1 = re.compile("(.)([A-Z][a-z]+)")
_CAMEL_2 = re.compile("([a-z0-9])([A-Z])")


def _convert_camel(name):
    return _CAMEL_2.sub(r"\1_\2", _CAMEL_1.sub(r"\1_\2", name)).lower()


def _map_name(obj, name):
    try:
        return object.__getattribute__(obj, name), name
    except AttributeError:
        pass
    renames = obj.__class__.__dict__.get("_deprecated")
    if renames and name in renames:
        newname = renames.get(name)
        if newname is None:
            return None, None
    else:
        newname = _convert_camel(name)
    try:
        return object.__getattribute__(obj, newname), newname
    except AttributeError:
        return None


class _BaseObject:
    """Resolves pep8 and camelCase attribute spellings interchangeably."""

    _fail_on_not_exist = False

    def __getattribute__(self, name):
        if name.startswith("__"):
            return object.__getattribute__(self, name)
        res = _map_name(self, name)
        if res is None:
            raise AttributeError(f"{name} is not a valid attribute for class {self.__class__}")
        value, newname = res
        if newname is None:
            logging.warning("%s is removed and will be ignored" % name)
            return None
        if newname is not name:
            logging.warning(f"{name} is deprecated, use {newname}")
        return value

    def __setattr__(self, name, value):
        res = _map_name(self, name)
        if res is None:
            if object.__getattribute__(self, "_fail_on_not_exist"):
                raise AttributeError(f"Unknown attribute {name} for class {self.__class__}")
            newname = name
        else:
            _, newname = res
        if newname is None:
            logging.warning("%s is removed and will be ignored" % name)
            return
        object.__setattr__(self, newname, value)
