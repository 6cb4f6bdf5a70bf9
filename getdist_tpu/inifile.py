"""Key=value settings files with inheritance (host-side config system).

Implements the reference's extended .ini dialect (``getdist/inifile.py``):
``INCLUDE(file)`` pulls in another file, ``DEFAULT(file)`` pulls one in
without overriding already-set keys, ``$(VAR)`` expands environment
variables, ``END`` stops parsing, booleans are ``T``/``F``, and typed
getters cover scalars, lists, arrays and indexed ``name(i)`` entries.
``setAttr`` writes a typed value onto an object, inferring the type from
the attribute's current value — the mechanism analysis settings use.
"""

import os

import numpy as np

__all__ = ["IniFile", "IniError"]


class IniError(Exception):
    pass


class IniFile:
    """Ordered key=value store, readable/savable as extended .ini text.

    :ivar params: dict of stored name -> value
    :ivar comments: dict of name -> preceding comment lines
    """

    def __init__(self, settings=None, keep_includes=False, expand_environment_variables=True):
        """
        :param settings: filename of a .ini file to read, or a dict of values
        :param keep_includes: if True, record INCLUDE/DEFAULT names instead of
            loading them (for re-saving); if False resolve them recursively
        :param expand_environment_variables: expand $(VAR) in values
        """
        self.params = {}
        self.comments = {}
        self.readOrder = []
        self.defaults = []
        self.includes = []
        self.original_filename = None
        self.expand_environment_variables = expand_environment_variables
        if isinstance(settings, str):
            self.readFile(settings, keep_includes)
        elif settings:
            self.params.update(settings)

    # -- parsing ------------------------------------------------------------
    def expand_placeholders(self, s):
        """Expand ``$(VAR)`` environment placeholders (``$$`` escapes ``$``)."""
        if "$(" not in s:
            return s
        out = []
        i = 0
        while i < len(s):
            if s[i] == "$" and i + 1 < len(s):
                if s[i + 1] == "$":
                    out.append("$")
                    i += 2
                    continue
                if s[i + 1] == "(":
                    close = s.find(")", i + 2)
                    if close != -1:
                        var = s[i + 2 : close]
                        out.append(os.environ.get(var, ""))
                        i = close + 1
                        continue
            out.append(s[i])
            i += 1
        return "".join(out)

    def readFile(self, filename, keep_includes=False, if_not_defined=False):
        try:
            self.original_filename = filename
            found_includes = []
            found_defaults = []
            pending_comments = []
            with open(filename, encoding="utf-8-sig") as handle:
                for raw in handle:
                    line = raw.strip()
                    if line == "END":
                        break
                    if line.startswith("#"):
                        pending_comments.append(line[1:].rstrip())
                        continue
                    if line.startswith("INCLUDE("):
                        found_includes.append(line[line.find("(") + 1 : line.rfind(")")])
                    elif line.startswith("DEFAULT("):
                        found_defaults.append(line[line.find("(") + 1 : line.rfind(")")])
                    elif line:
                        eq = line.find("=")
                        if eq >= 0:
                            key = line[:eq].strip()
                            if key in self.params:
                                if if_not_defined:
                                    pending_comments = []
                                    continue
                                raise IniError(f"Error: duplicate key: {key} in {filename}")
                            value = line[eq + 1 :].strip()
                            if self.expand_environment_variables:
                                value = self.expand_placeholders(value)
                            self.params[key] = value
                            self.readOrder.append(key)
                            if pending_comments:
                                self.comments[key] = pending_comments
                    pending_comments = []

            if keep_includes:
                self.includes += found_includes
                self.defaults += found_defaults
            else:
                base = os.path.dirname(filename)
                for inc in found_includes:
                    path = inc if os.path.isabs(inc) else os.path.join(base, inc)
                    self.readFile(path, if_not_defined=if_not_defined)
                for dft in found_defaults:
                    path = dft if os.path.isabs(dft) else os.path.join(base, dft)
                    self.readFile(path, if_not_defined=True)
            return self.params
        except Exception:
            print("Error in " + filename)
            raise

    # -- serialization ------------------------------------------------------
    def fileLines(self):
        def render(value):
            if isinstance(value, str):
                return value
            if isinstance(value, bool):
                return "T" if value else "F"
            return str(value)

        lines = [f"INCLUDE({inc})" for inc in self.includes]
        lines += [f"DEFAULT({dft})" for dft in self.defaults]
        remaining = sorted(self.params.keys())
        for key in self.readOrder:
            if key in remaining:
                lines.append(key + "=" + render(self.params[key]))
                remaining.remove(key)
        lines.extend(key + "=" + render(self.params[key]) for key in remaining)
        return lines

    def __str__(self):
        return "\n".join(self.fileLines())

    def saveFile(self, filename=None):
        """Write back to .ini text."""
        filename = filename or self.original_filename
        if not filename:
            raise IniError("No filename for iniFile.saveFile()")
        with open(filename, "w", encoding="utf-8") as handle:
            handle.write(str(self))

    # -- mutation helpers ----------------------------------------------------
    def replaceTags(self, placeholder, text):
        for key in self.params:
            self.params[key] = self.params[key].replace(placeholder, text)
        return self.params

    def delete_keys(self, keys):
        for key in keys:
            self.params.pop(key, None)

    # -- typed access ---------------------------------------------------------
    def _undefined(self, name):
        raise IniError("parameter not defined: " + name)

    def hasKey(self, name):
        """Whether the key exists at all."""
        return name in self.params

    def isSet(self, name, allowEmpty=False):
        """Whether the key exists and (unless allowEmpty) is non-empty."""
        return name in self.params and (allowEmpty or self.params[name] != "")

    def asType(self, name, tp, default=None, allowEmpty=False):
        if self.isSet(name, allowEmpty):
            if tp is bool:
                return self.bool(name, default)
            if tp is list:
                return self.split(name, default)
            if tp is np.ndarray:
                return self.ndarray(name, default)
            return tp(self.params[name])
        if default is not None:
            return default
        self._undefined(name)

    def setAttr(self, name, instance, default=None, allowEmpty=False):
        """Set ``instance.<name>`` from this ini, typed like its current value."""
        default = getattr(instance, name, default)
        setattr(instance, name, self.asType(name, type(default), default, allowEmpty=allowEmpty))

    def getAttr(self, instance, name, default=None, comment=None):
        """Record ``instance.<name>`` into this ini (for saving settings)."""
        self.params[name] = getattr(instance, name, default)
        if comment:
            self.comments[name] = comment

    def bool(self, name, default=False):
        """Boolean value; text must start with T or F."""
        if self.isSet(name):
            value = self.params[name]
            if isinstance(value, bool):
                return value
            if value[0] == "T":
                return True
            if value[0] == "F":
                return False
            raise IniError("parameter does not have valid T(rue) or F(alse) boolean value: " + name)
        if default is not None:
            return default
        self._undefined(name)

    def string(self, name, default=None, allowEmpty=True):
        """String value."""
        return self.asType(name, str, default, allowEmpty=allowEmpty)

    def float(self, name, default=None):
        """Float value."""
        return self.asType(name, float, default)

    def int(self, name, default=None):
        """Int value."""
        return self.asType(name, int, default)

    def split(self, name, default=None, tp=None):
        """Space-separated list of values, optionally cast to tp."""
        if name in self.params and isinstance(self.params[name], (list, tuple)):
            return list(self.params[name]) if tp is None else [tp(x) for x in self.params[name]]
        s = self.string(name, default)
        if isinstance(s, str):
            return s.split() if tp is None else [tp(x) for x in s.split()]
        return s

    def list(self, name, default=None, tp=None):
        """List of values (see :meth:`split`)."""
        return self.split(name, default or [], tp)

    def bool_list(self, name, default=None):
        """List of booleans (``name = T F T``)."""
        return self.split(name, default or [], tp=bool)

    def float_list(self, name, default=None):
        """List of floats."""
        return self.split(name, default or [], tp=float)

    def int_list(self, name, default=None):
        """List of ints."""
        return self.split(name, default or [], tp=int)

    def ndarray(self, name, default=None, tp=np.float64):
        """Numpy array of values."""
        return np.array(self.split(name, default, tp=tp))

    def array_int(self, name, index=1, default=None):
        """Int from an indexed ``name(i)`` entry."""
        return self.int("%s(%u)" % (name, index), default)

    def array_string(self, name, index=1, default=None):
        """String from an indexed ``name(i)`` entry."""
        return self.string("%s(%u)" % (name, index), default)

    def array_bool(self, name, index=1, default=None):
        """Bool from an indexed ``name(i)`` entry."""
        return self.bool("%s(%u)" % (name, index), default)

    def array_float(self, name, index=1, default=None):
        """Float from an indexed ``name(i)`` entry."""
        return self.float("%s(%u)" % (name, index), default)

    def relativeFileName(self, name, default=None):
        s = self.string(name, default)
        if not os.path.isabs(s) and self.original_filename is not None:
            return os.path.join(os.path.dirname(self.original_filename), s)
        return s
