"""Chain directory grids: root discovery over directory trees.

Duck-type compatible with CosmoMC/Cobaya ``batchjob`` grid objects
(reference ``getdist/chain_grid.py``): walks a directory hierarchy,
indexes chain roots (disambiguating duplicates by path suffix), and
exposes per-grid ``getdist.ini`` analysis options.
"""

import glob
import os

from getdist_tpu.inifile import IniFile

__all__ = ["ChainDirGrid", "ChainItem", "get_chain_root_files", "load_supported_grid", "is_grid_object"]


def file_root_to_root(root):
    return os.path.basename(root) if not root.endswith((os.sep, "/")) else os.path.basename(root[:-1]) + os.sep


def get_chain_root_files(rootdir):
    """Root names of all chains in a directory (via .paramnames or Cobaya
    updated.yaml sidecars that have actual chain files)."""
    from getdist_tpu.chains import hasChainFiles

    files = [os.path.splitext(f)[0] for f in glob.glob(os.path.join(rootdir, "*.paramnames"))]
    ending = "updated.yaml"
    files += [
        f[: -len(ending)].rstrip("_.")
        for f in glob.glob(os.path.join(rootdir, "*" + ending))
        if ".minimize." not in f
    ]
    # glob results already carry rootdir (relative or absolute), so test
    # them directly: joining again breaks relative chain_dir paths
    files = [f for f in files if hasChainFiles(f)]
    files.sort()
    return files


def is_grid_object(obj):
    return hasattr(obj, "resolve_root") or hasattr(obj, "resolveRoot")


def load_supported_grid(chain_dir):
    """Load a CosmoMC/Cobaya grid object for a directory if the relevant
    package is installed, else None (plain ChainDirGrid used instead)."""
    if is_grid_object(chain_dir):
        return chain_dir
    config_file = os.path.join(chain_dir, "config", "config.ini")
    if os.path.exists(config_file):
        grid_settings = IniFile(config_file)
        if grid_settings.hasKey("cobaya_version"):
            try:
                from cobaya.grid_tools import batchjob

                return batchjob.readobject(chain_dir)
            except ImportError:
                return None
        else:
            try:
                from paramgrid import batchjob, gridconfig

                if gridconfig.pathIsGrid(chain_dir):
                    return batchjob.readobject(chain_dir)
            except ImportError:
                return None
    return None


class ChainItem:
    """One chain root on disk; duck-types BatchJob's JobItem."""

    def __init__(self, batchPath, chainRoot, paramtag, name=None):
        self.batchPath = batchPath
        self.chainRoot = chainRoot
        self.paramtag = paramtag
        self.name = name or os.path.basename(chainRoot)
        self.chainPath = os.path.dirname(chainRoot)


class ChainDirGrid:
    """All chains found under a folder tree, indexed by (unique) root name.

    A ``getdist.ini`` in the base directory supplies default analysis
    settings for every chain in the tree.
    """

    def __init__(self, base):
        self.batchPath = base
        self.roots = {}
        self.base_dir_names = set()
        self._sorted_names = {}
        option_file = os.path.join(base, "getdist.ini")
        self.getdist_options = IniFile(option_file).params if os.path.exists(option_file) else {}
        for top, dirs, _files in os.walk(base):
            for _dir in dirs:
                files = get_chain_root_files(os.path.join(top, _dir))
                if files:
                    self._add(_dir, os.path.join(top, _dir), files)
                for sub_base, sub_dirs, _sub_files in os.walk(os.path.join(top, _dir)):
                    for _subdir in sub_dirs:
                        files = get_chain_root_files(os.path.join(sub_base, _subdir))
                        if files:
                            self._add(_dir, os.path.join(sub_base, _subdir), files)
            break
        self._make_unique()

    def normed_name(self, root):
        return "_".join(sorted(root.replace("__", "_").replace("_post", "").replace(".post.", "_").split("_")))

    def _add(self, dir_tag, dirname, roots):
        self.base_dir_names.add(dir_tag)
        for root in roots:
            root = file_root_to_root(root)
            self.roots[root] = self.roots.get(root, []) + [
                ChainItem(self.batchPath, os.path.join(dirname, root), dir_tag, root)
            ]

    def _make_unique(self):
        # Disambiguate duplicate root names by prefixing path components
        for root in list(self.roots):
            normed = self.normed_name(root)
            self._sorted_names[normed] = self._sorted_names.get(normed, []) + self.roots[root]
            if len(self.roots[root]) > 1:
                paths = [item.chainRoot.split(os.sep) for item in self.roots[root]]
                i = -2
                while all(s[i] == paths[0][i] for s in paths[1:]):
                    i -= 1
                for parts, item in zip(paths, self.roots[root]):
                    item.name = "/".join(parts[i:])
                    item.chainPath = os.sep.join(parts[:i])
                    self.roots[item.name] = item
                self.roots.pop(root)
            else:
                self.roots[root] = self.roots[root][0]

    def roots_for_dir(self, paramtag):
        return [item.name for item in self.roots.values() if item.paramtag == paramtag]

    def resolve_root(self, root):
        """ChainItem for a root name (normalized-name fallback)."""
        item = self.roots.get(root)
        if not item:
            normed = self.normed_name(root)
            items = self._sorted_names.get(normed)
            if items:
                if len(items) == 1:
                    return items[0]
                raise ValueError(
                    "No exact match for %s and normalized name %s is ambiguous: %r"
                    % (root, normed, [i.chainRoot for i in items])
                )
        return item

    def resolveRoot(self, root):
        return self.resolve_root(root)
