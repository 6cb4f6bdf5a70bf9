"""Publication plotting: triangle/corner, 2D contour, scatter, and 4D plots.

Host-side layer (API-compatible with reference ``getdist/plots.py``)
consuming device-computed Density1D/Density2D grids: figure orchestration
over matplotlib, root-name -> samples resolution with caching
(:class:`MCSampleAnalysis`), line/contour style cycling, axis-limit
negotiation against hard priors, legends, and the named style registry.
"""

import copy
import logging
import os
import sys
import warnings
from collections.abc import Iterable, Mapping, Sequence
from typing import Any

import matplotlib

if (
    not any(b in matplotlib.rcParams["backend"] for b in ["inline", "ipykern"])
    and "linux" in sys.platform
    and os.environ.get("DISPLAY", "") == ""
):
    matplotlib.use("Agg")
import matplotlib.axis
import matplotlib.colors
import matplotlib.gridspec
import matplotlib.lines
import matplotlib.patches
import matplotlib.pyplot as plt
import numpy as np
from matplotlib import cm, rcParams
from matplotlib.font_manager import font_scalings
from matplotlib.ticker import ScalarFormatter

import getdist_tpu
from getdist_tpu._base import _BaseObject
from getdist_tpu.chain_grid import ChainDirGrid, get_chain_root_files, is_grid_object, load_supported_grid
from getdist_tpu.chains import findChainFileRoot
from getdist_tpu.densities import Density2D
from getdist_tpu.gaussian_mixtures import MixtureND
from getdist_tpu.inifile import IniFile
from getdist_tpu.matplotlib_ext import BoundedMaxNLocator, SciFuncFormatter
from getdist_tpu.mcsamples import MCSamples, loadMCSamples
from getdist_tpu.paramnames import ParamInfo, ParamNames, escapeLatex, makeList, mergeRenames
from getdist_tpu.types import empty_dict


class GetDistPlotError(Exception):
    """Error raised while plotting."""


def extend_list_zip(*args):
    # zip where scalar args repeat and short lists extend with last entry
    vals = [(list(arg) if isinstance(arg, (list, tuple)) else [arg]) for arg in args]
    for i in range(len(args[0])):
        yield [v[i if i < len(v) else -1] for v in vals]


# default value of every public GetDistPlotSettings knob (reference
# ``plots.py:58-251`` documents each); list/dict values are copied per
# instance in __init__
_PLOT_SETTING_DEFAULTS = dict(
    scaling=True,
    scaling_reference_size=3.5,
    scaling_factor=2,
    direct_scaling=False,
    plot_meanlikes=False,
    prob_label=None,
    norm_prob_label="P",
    prob_y_ticks=False,
    norm_1d_density=False,
    line_styles=["-k", "-r", "-b", "-g", "-m", "-c", "-y", "--k", "--r", "--b", "--g", "--m"],
    plot_args=None,
    line_dash_styles={"--": (3, 2), "-.": (4, 1, 1, 1)},
    line_labels=True,
    num_shades=80,
    shade_level_scale=1.8,
    progress=False,
    tight_layout=True,
    constrained_layout=False,
    no_triangle_axis_labels=True,
    colormap="Blues",
    colormap_scatter="jet",
    colorbar_tick_rotation=None,
    colorbar_label_pad=0.0,
    colorbar_label_rotation=-90.0,
    colorbar_axes_fontsize=11.0,
    subplot_size_ratio=None,
    param_names_for_labels=None,
    legend_colored_text=False,
    legend_loc="best",
    legend_frac_subplot_margin=0.05,
    legend_fontsize=12.0,
    legend_frame=True,
    legend_rect_border=False,
    figure_legend_loc="upper center",
    figure_legend_frame=True,
    figure_legend_ncol=0,
    linewidth=1.0,
    linewidth_contour=0.6,
    linewidth_meanlikes=0.5,
    num_plot_contours=2,
    solid_contour_palefactor=0.6,
    solid_colors=["#006FED", "#E03424", "gray", "#009966", "#000866", "#336600", "#006633", "m", "r"],
    alpha_filled_add=0.85,
    alpha_factor_contour_lines=0.5,
    shade_meanlikes=False,
    axes_fontsize=11.0,
    axes_labelsize=14.0,
    axis_marker_color="gray",
    axis_marker_ls="--",
    axis_marker_lw=0.5,
    axis_tick_powerlimits=(-4, 5),
    axis_tick_max_labels=7,
    axis_tick_step_groups=[[1, 2, 5, 10], [2.5, 3, 4, 6, 8], [1.5, 7, 9]],
    axis_tick_x_rotation=0.0,
    axis_tick_y_rotation=0.0,
    scatter_size=3.0,
    fontsize=12.0,
    title_limit=0,
    title_limit_labels=True,
    title_limit_fontsize=None,
)


class GetDistPlotSettings(_BaseObject):
    """Plot style settings (colors, sizes, fonts, contours...).

    See the reference documentation (``plots.py:58-301``) for the meaning
    of each knob; the attribute set and defaults here are identical so
    existing getdist plot scripts are drop-in.
    """

    _deprecated = {
        "lab_fontsize": "axes_labelsize",
        "colorbar_rotation": "colorbar_tick_rotation",
        "font_size ": "fontsize",
        "legend_frac_subplot_line": None,
        "legend_position_config": None,
        "lineM": "line_styles",
        "lw1": "linewidth",
        "lw_contour": "linewidth_contour",
        "lw_likes": "linewidth_meanlikes",
        "thin_long_subplot_ticks": None,
        "tick_prune": None,
        "tight_gap_fraction": None,
        "x_label_rotation": "axis_tick_x_rotation",
    }

    def __init__(self, subplot_size_inch: float = 2, fig_width_inch: float | None = None):
        """
        :param subplot_size_inch: subplot size (determines default fonts)
        :param fig_width_inch: if set, fixed total figure width in inches
        """
        for knob, value in _PLOT_SETTING_DEFAULTS.items():
            # fresh containers per instance so edits never leak between plotters
            setattr(self, knob, copy.copy(value) if isinstance(value, (list, dict)) else value)
        self.scaling_max_axis_size: float | None = self.scaling_reference_size
        self.fig_width_inch = fig_width_inch
        self.subplot_size_inch: float = subplot_size_inch
        self._fail_on_not_exist = True

    def _numerical_fontsize(self, size):
        size = size or self.fontsize or 11
        if isinstance(size, str):
            scale = font_scalings.get(size)
            return self.fontsize * (scale or 1)
        return size or self.fontsize

    def scaled_fontsize(self, ax_size, var, default=None):
        """Font size scaled for the given axis size (inches)."""
        var = self._numerical_fontsize(var or default)
        if not self.scaling or self.scaling_max_axis_size is not None and not self.scaling_max_axis_size:
            return var
        if self.scaling_max_axis_size is None or ax_size < (self.scaling_max_axis_size or self.scaling_reference_size):
            if self.direct_scaling:
                return var * ax_size / self.scaling_reference_size
            return max(5, var + self.scaling_factor * (ax_size - self.scaling_reference_size))
        return var + 2 * (self.scaling_max_axis_size - self.scaling_reference_size)

    def scaled_linewidth(self, ax_size, linewidth):
        """Line width scaled for the given axis size (inches)."""
        linewidth = linewidth or self.linewidth
        if not self.scaling:
            return linewidth
        return max(0.6, linewidth * ax_size / self.scaling_reference_size)

    def set_with_subplot_size(self, size_inch=3.5, size_mm=None, size_ratio=None):
        """Set subplot size in inches (or millimeters)."""
        if size_mm:
            size_inch = size_mm * 0.0393700787
        self.subplot_size_inch = size_inch
        self.subplot_size_ratio = size_ratio

    def rc_sizes(self, axes_fontsize=None, lab_fontsize=None, legend_fontsize=None):
        """Take font sizes from matplotlib rcParams defaults."""
        self.fontsize = self._numerical_fontsize(rcParams["font.size"])
        self.legend_fontsize = legend_fontsize or self._numerical_fontsize(rcParams["legend.fontsize"])
        self.axes_labelsize = lab_fontsize or self._numerical_fontsize(rcParams["axes.labelsize"])
        self.axes_fontsize = axes_fontsize or self._numerical_fontsize(rcParams["xtick.labelsize"])

    def __str__(self):
        return str({k: v for k, v in self.__dict__.items() if not k.startswith("_")})


default_settings = GetDistPlotSettings()
defaultSettings = default_settings


def get_plotter(style: str | None = None, **kwargs):
    """New plotter for the active (or named) style."""
    return _style_manager.active_class(style)(**kwargs)


def get_single_plotter(
    ratio=None, width_inch=None, scaling=None, rc_sizes=False, style: str | None = None, **kwargs
):
    """Plotter for a single fixed-width plot (see reference
    ``plots.py:319-347``)."""
    return _style_manager.active_class(style).get_single_plotter(
        ratio=ratio, width_inch=width_inch, scaling=scaling, rc_sizes=rc_sizes, **kwargs
    )


def get_subplot_plotter(
    subplot_size=None, width_inch=None, scaling=None, rc_sizes=False, subplot_size_ratio=None, style=None, **kwargs
) -> "GetDistPlotter":
    """Plotter for an array of subplots (see reference ``plots.py:350-386``)."""
    return _style_manager.active_class(style).get_subplot_plotter(
        subplot_size=subplot_size,
        width_inch=width_inch,
        scaling=scaling,
        rc_sizes=rc_sizes,
        subplot_size_ratio=subplot_size_ratio,
        **kwargs,
    )


getPlotter = get_plotter
getSubplotPlotter = get_subplot_plotter
getSinglePlotter = get_single_plotter


class RootInfo:
    """Information about a set of samples on disk."""

    __slots__ = ["batch", "path", "root"]

    def __init__(self, root: str, path: str, batch=None):
        self.root = root
        self.batch = batch
        self.path = path


class MCSampleAnalysis(_BaseObject):
    """Maps root names to cached MCSamples and cached 1D/2D densities.

    Accessed as plotter.sample_analyser; the seam where root-name strings
    become loaded (device-resident) samples.
    """

    def __init__(self, chain_locations, settings=None):
        """
        :param chain_locations: directory/grid path (or list searched in order)
        :param settings: IniFile, .ini filename, or settings dict
        """
        self.chain_dirs = []
        self.chain_locations = []
        self.ini = None
        self.chain_settings_have_priority = True
        if chain_locations is not None:
            if isinstance(chain_locations, str) or not isinstance(chain_locations, Iterable):
                chain_locations = [chain_locations]
            for chain_dir in chain_locations:
                self.add_chain_dir(chain_dir)
        self.reset(settings)

    def bounds_for_root(self, root):
        """Object exposing getUpper/getLower for a root's hard bounds."""
        if hasattr(root, "get_upper") or hasattr(root, "getUpper"):
            return root
        return self.samples_for_root(root)

    def params_for_root(self, root, label_params=None):
        """ParamNames for a root, with optional label override file."""
        if hasattr(root, "paramNames"):
            names = root.paramNames
        else:
            names = self.samples_for_root(root).getParamNames()
        if label_params is not None:
            names.setLabelsAndDerivedFromParamNames(label_params)
        return names

    def load_single_samples(self, root):
        """Cached unit-weight scatter samples for a root."""
        if root not in self.single_samples:
            self.single_samples[root] = self.samples_for_root(root).makeSingleSamples()
        return self.single_samples[root]

    def get_density_grid(self, root, param1, param2, conts=2, likes=False):
        """Cached Density2D for (root, x, y)."""
        rootdata = self.densities_2D.setdefault(root, {})
        key = (param1.name, param2.name, likes, conts)
        density = rootdata.get(key)
        if not density:
            samples = self.samples_for_root(root)
            density = samples.get2DDensityGridData(param1.name, param2.name, num_plot_contours=conts, meanlikes=likes)
            if density is None:
                return None
            rootdata[key] = density
        return density

    def get_density(self, root, param, likes=False):
        """Cached Density1D for (root, parameter)."""
        rootdata = self.densities_1D.setdefault(root, {})
        name = param.name if isinstance(param, ParamInfo) else param
        samples = self.samples_for_root(root)
        key = (name, likes)
        rootdata.pop((name, not likes), None)
        density = rootdata.get(key)
        if density is None:
            density = samples.get1DDensityGridData(name, meanlikes=likes)
            if density is None:
                return None
            rootdata[key] = density
        return density

    def remove_root(self, root):
        """Drop a root from the caches."""
        self.mcsamples.pop(root, None)
        self.single_samples.pop(root, None)
        self.densities_1D.pop(root, None)
        self.densities_2D.pop(root, None)

    def add_root(self, file_root):
        """Register samples for a file root (path string or RootInfo)."""
        if isinstance(file_root, RootInfo):
            if file_root.batch:
                return self.samples_for_root(file_root.root)
            return self.samples_for_root(
                file_root.root, os.path.normpath(os.path.join(file_root.path, file_root.root))
            )
        return self.samples_for_root(os.path.basename(file_root), file_root)

    def add_roots(self, roots):
        """Add multiple file roots (see :meth:`add_root`)."""
        for root in roots:
            self.add_root(root)

    def samples_for_root(self, root, file_root=None, cache=True, settings=None):
        """MCSamples for a root name (passes through MCSamples instances)."""
        if isinstance(root, MCSamples):
            return root
        if isinstance(root, MixtureND):
            raise GetDistPlotError("MixtureND is a distribution not a set of samples")
        if not isinstance(root, str):
            raise GetDistPlotError("Root names must be strings (or MCSamples instances)")
        if root in self.mcsamples and cache:
            return self.mcsamples[root]
        if os.path.isabs(root):
            file_root = root
        job_item = None
        dist_settings = dict(settings) if (settings and self.chain_settings_have_priority) else {}
        if not file_root:
            file_root, job_item = self._search_chain_dirs(root, dist_settings)
        if not file_root:
            raise GetDistPlotError("chain not found: " + root)
        if not self.chain_settings_have_priority:
            dist_settings.update(self.ini.params)
            if settings:
                dist_settings.update(settings)
        self.mcsamples[root] = loadMCSamples(file_root, self.ini, job_item, settings=dist_settings)
        return self.mcsamples[root]

    def _search_chain_dirs(self, root, dist_settings):
        """Locate a root in the registered chain dirs / grid objects,
        folding any per-grid or per-directory settings into dist_settings.
        Returns (file_root or None, grid job item or None)."""
        for chain_dir in self.chain_dirs:
            if is_grid_object(chain_dir):
                resolver = getattr(chain_dir, "resolve_root", None) or chain_dir.resolveRoot
                job_item = resolver(root)
                if job_item:
                    dist_settings.update(getattr(chain_dir, "getdist_options", {}))
                    dist_settings.update(getattr(job_item, "dist_settings", {}))
                    return job_item.chainRoot, job_item
            else:
                file_root = findChainFileRoot(chain_dir, root)
                dir_ini = os.path.join(chain_dir, "getdist.ini")
                if os.path.exists(dir_ini):
                    dist_settings.update(IniFile(dir_ini).params)
                if file_root:
                    return file_root, None
        return None, None

    def reset(self, settings=None, chain_settings_have_priority=True):
        """Clear caches; optionally set new analysis settings."""
        self.analysis_settings = {}
        if isinstance(settings, IniFile) or settings.__class__.__name__ == "IniFile":
            ini = settings
        elif isinstance(settings, Mapping):
            ini = IniFile(getdist_tpu.default_getdist_settings)
            ini.params.update(settings)
        else:
            ini = IniFile(settings or getdist_tpu.default_getdist_settings)
        if self.ini:
            self.ini.params.update(ini.params)
        else:
            self.ini = ini
        self.mcsamples = {}
        self.densities_1D = dict()
        self.densities_2D = dict()
        self.single_samples = dict()
        self.chain_settings_have_priority = chain_settings_have_priority

    def add_chain_dir(self, chain_dir):
        """Add a directory or grid to search for chain roots."""
        if isinstance(chain_dir, str):
            chain_dir = os.path.normpath(chain_dir)
        if chain_dir in self.chain_locations:
            return
        self.chain_locations.append(chain_dir)
        batch = load_supported_grid(chain_dir)
        if batch:
            self.chain_dirs.append(batch)
            if hasattr(batch, "commonPath") and os.path.exists(batch.commonPath + "getdist_common.ini"):
                batchini = IniFile(batch.commonPath + "getdist_common.ini")
                if self.ini:
                    self.ini.params.update(batchini.params)
                else:
                    self.ini = batchini
        elif get_chain_root_files(chain_dir):
            self.chain_dirs.append(chain_dir)
        else:
            self.chain_dirs.append(ChainDirGrid(chain_dir))



class GetDistPlotter(_BaseObject):
    """Main class for making plots from one or more sets of samples.

    :ivar settings: a :class:`GetDistPlotSettings` instance
    :ivar subplots: 2D array of matplotlib Axes
    :ivar sample_analyser: the :class:`MCSampleAnalysis` resolving root names
    """

    def __init__(self, chain_dir=None, settings=None, analysis_settings=None, auto_close=False):
        """
        :param chain_dir: directory (or grid hierarchy, or list) to search for chains
        :param settings: optional GetDistPlotSettings
        :param analysis_settings: settings for sample analysis
        :param auto_close: close the figure when a new plot is made
        """
        self.chain_dir = chain_dir
        if settings is None:
            self.set_default_settings()
        else:
            self.settings = settings
        self.sample_analyser = MCSampleAnalysis(chain_dir or getdist_tpu.default_grid_root, analysis_settings)
        self.auto_close = auto_close
        self.fig = None
        self.new_plot()

    def samples_for_root(self, root, file_root=None, cache=True, settings=None):
        """MCSamples for a root name (delegates to the sample analyser)."""
        return self.sample_analyser.samples_for_root(root, file_root, cache, settings)

    def get_axes_for_params(self, *pars, **kwargs):
        """The axes whose associated parameters match the given names."""
        ordered = kwargs.get("ordered", True)
        par_list = self._par_name_list(pars)
        if not ordered:
            par_list = set(par_list)
            func = set
        else:
            func = list
        for ax in self.subplots.reshape(-1):
            if ax:
                params = getattr(ax, "getdist_params", None)
                if params is not None and func(self._par_name_list(params)) == par_list:
                    self._last_ax = ax
                    return ax
        return None

    @staticmethod
    def _par_name_list(par_list):
        return [p.name if isinstance(p, ParamInfo) else p for p in par_list]

    def export(self, fname=None, adir=None, watermark=None, tag=None, **kwargs):
        """Save the figure (extension determines the format)."""
        if fname is None:
            fname = os.path.basename(sys.argv[0]).replace(".py", "")
        if tag:
            fname += "_" + tag
        if "." not in fname:
            fname += "." + getdist_tpu.default_plot_output
        if adir is not None and os.sep not in fname and "/" not in fname:
            fname = os.path.join(adir, fname)
        adir = os.path.dirname(fname)
        if adir and not os.path.exists(adir):
            os.makedirs(adir)
        if watermark:
            self.fig.text(
                0.45, 0.5, escapeLatex(watermark), fontsize=30, color="gray", ha="center", va="center", alpha=0.2
            )
        self.fig.savefig(fname, bbox_extra_artists=self.extra_artists, bbox_inches="tight", **kwargs)

    def add_text_left(self, text_label, x=0.05, y=0.06, ax=None, **kwargs):
        """Add a left-aligned text label."""
        args = {"horizontalalignment": "left"}
        args.update(kwargs)
        self.add_text(text_label, x, y, ax, **args)

    def add_text(self, text_label, x=0.95, y=0.06, ax=None, **kwargs):
        """Add a text label inside the axes."""
        args = {
            "horizontalalignment": "right" if x > 0.5 else "left",
            "verticalalignment": "center",
            "fontsize": self._scaled_fontsize(self.settings.fontsize),
        }
        args.update(kwargs)
        ax = self.get_axes(ax)
        ax.text(x, y, text_label, transform=ax.transAxes, **args)

    def plot_4d(
        self,
        roots,
        params,
        color_bar=True,
        colorbar_args=empty_dict,
        ax=None,
        lims=empty_dict,
        azim=15,
        elev=None,
        dist=12,
        alpha=0.5,
        marker="o",
        max_scatter_points=None,
        shadow_color=None,
        shadow_alpha=0.1,
        fixed_color=None,
        compare_colors=None,
        animate=False,
        anim_angle_degrees=360,
        anim_step_degrees=0.6,
        anim_fps=15,
        mp4_filename=None,
        mp4_bitrate=-1,
        **kwargs,
    ):
        """3D x-y-z scatter colored by a fourth parameter, with optional
        rotation animation / mp4 (see reference ``plots.py:3556-3737``)."""
        roots = makeList(roots)
        if not params:
            raise GetDistPlotError("No parameters for plot_4d!")
        params = self.get_param_array(roots[0], params)
        if not ax:
            if not self.fig:
                self.make_figure()
            ax = self._subplot(0, 0, pars=(p.name for p in params[:3]), projection="3d")
            ax.dist = dist
        pts = []
        for i, (root, alph, mark) in enumerate(extend_list_zip(roots, alpha, marker)):
            pts.append(
                self.add_4d_scatter(
                    root,
                    params,
                    ax,
                    color_bar=not i and color_bar,
                    fixed_color=(
                        fixed_color if not i else (compare_colors[i - 1] if compare_colors is not None else None)
                    ),
                    lims=lims,
                    alpha=alph,
                    marker=mark,
                    max_scatter_points=max_scatter_points,
                    colorbar_args=colorbar_args,
                    **kwargs,
                )
            )
        axes = ax.xaxis, ax.yaxis, ax.zaxis
        lim_x, lim_y, lim_z = (
            tuple(
                (_cur_lim if _lim is None else _lim)
                for _lim, _cur_lim in zip(lims.get(par.name, (None, None)), axis.get_view_interval())
            )
            for par, axis in zip(params, axes)
        )
        for axis in axes:
            self._set_main_axis_properties(axis, True)
        ax.set_xlim(*lim_x)
        ax.set_ylim(*lim_y)
        ax.set_zlim(*lim_z)

        if shadow_color:
            if shadow_color is True:
                shadow_color = ["gray"]
                if len(roots) > 1 and compare_colors is not None:
                    shadow_color.extend(compare_colors)
            if shadow_alpha is None:
                shadow_alpha = alpha
            for (x, y, z), shadow, alph, mark in extend_list_zip(pts, shadow_color, shadow_alpha, marker):
                if shadow is not None:
                    opts = dict(marker=mark or "o", zorder=-1, s=kwargs.get("s", self.settings.scatter_size), alpha=alph)
                    ax.scatter(x, y, zs=lim_z[0], c=shadow, **opts)
                    ax.scatter(y, z, zdir="x", zs=lim_x[0], c=shadow, **opts)
                    ax.scatter(x, z, zdir="y", zs=lim_y[0], c=shadow, **opts)

        self.set_xlabel(params[0], ax)
        self.set_ylabel(params[1], ax)
        self.set_zlabel(params[2], ax)
        ax.view_init(azim=azim, elev=elev)

        if animate:
            from matplotlib import animation

            def rotate(angle):
                ax.view_init(azim=azim + angle)

            self.fig.rot_animation = animation.FuncAnimation(
                self.fig, rotate, frames=np.arange(0, anim_angle_degrees, anim_step_degrees), interval=1000 / anim_fps
            )
            if mp4_filename:
                writer = animation.writers["ffmpeg"](fps=anim_fps, bitrate=mp4_bitrate)
                self.fig.rot_animation.save(mp4_filename, writer=writer)

    # -- text/export -------------------------------------------------------------

    def add_4d_scatter(
        self,
        root,
        params,
        ax,
        color_bar=False,
        max_scatter_points=None,
        lims=empty_dict,
        fixed_color=None,
        colorbar_args=empty_dict,
        **kwargs,
    ):
        """Add a 3D (x,y,z) scatter colored by a fourth parameter."""
        samps = self.sample_analyser.samples_for_root(root)
        params = self.get_param_array(root, params)
        ix = samps.random_single_samples_indices(max_samples=max_scatter_points or samps.max_scatter_points)
        if len(params) == 3:
            fixed_color = fixed_color or "k"
        if len(params) < 3 + (0 if fixed_color else 1):
            raise GetDistPlotError("4d plot must provide list of three or four parameters")
        if fixed_color:
            params = params[:3]
        for name, lim in lims.items():
            if not isinstance(lim, Sequence) or len(lim) != 2:
                raise GetDistPlotError("lims for 4d plot must be dictionary of names and upper/lower tuples")
            if lim[0] is not None:
                ix = ix[samps[name][ix] > lim[0]]
            if lim[1] is not None:
                ix = ix[samps[name][ix] < lim[1]]
        samples = []
        for param in params:
            if hasattr(param, "getDerived"):
                samples.append(
                    param.getDerived(self._make_param_object(self.param_names_for_root(root), samps.samples[ix, :]))
                )
            else:
                samples.append(samps[param.name][ix])
        x, y, z = samples[:3]
        color_values = fixed_color or samples[3]
        opts = dict({"marker": "o", "cmap": self.settings.colormap_scatter, "s": self.settings.scatter_size}, **kwargs)
        if fixed_color:
            del opts["cmap"]
        ax.scatter(x, y, z, c=color_values, depthshade=True, **opts)
        if color_bar and not fixed_color:
            mappable = cm.ScalarMappable(
                matplotlib.colors.Normalize(color_values.min(), color_values.max()), cmap=opts["cmap"]
            )
            mappable.set_array(color_values)
            self.last_colorbar = self.add_colorbar(params[3], mappable=mappable, ax=ax, colorbar_args=colorbar_args)
        return x, y, z

    def plots_3d_z(self, roots, param_x, param_y, param_z=None, max_z=None, **kwargs):
        """3D subplots of (x, y) colored by each parameter in param_z."""
        roots = makeList(roots)
        param_z = self.get_param_array(roots[0], param_z)
        if max_z is not None and len(param_z) > max_z:
            param_z = param_z[:max_z]
        param_x, param_y = self.get_param_array(roots[0], [param_x, param_y])
        sets = [[param_x, param_y, z] for z in param_z if z != param_x and z != param_y]
        return self.plots_3d(roots, sets, **kwargs)

    def plots_3d(self, roots, param_sets, nx=None, legend_labels=None, **kwargs):
        """Multiple 3D (color-scatter) subplots."""
        roots = makeList(roots)
        sets = [[self._check_param(roots[0], param) for param in param_group] for param_group in param_sets]
        plot_col, plot_row = self.make_figure(len(sets), nx=nx, ystretch=1 / 1.3)
        for i, triplet in enumerate(sets):
            ax = self._subplot_number(i, pars=triplet)
            self.plot_3d(roots, triplet, ax=ax, _no_finish=True, **kwargs)
        self.finish_plot(self._default_legend_labels(legend_labels, roots[1:]))
        return plot_col, plot_row

    def plot_3d(
        self,
        roots,
        params=None,
        params_for_plots=None,
        color_bar=True,
        line_offset=0,
        add_legend_proxy=True,
        alpha_samples=False,
        ax=None,
        **kwargs,
    ):
        """2D scatter colored by a third parameter, plus contours for any
        additional roots (see reference ``plots.py:3360-3444``)."""
        roots = makeList(roots)
        _no_finish = kwargs.pop("_no_finish", False)
        if params_for_plots:
            if params is not None:
                raise GetDistPlotError("plot_3d uses either params OR params_for_plots")
            params_for_plots = [self.get_param_array(root, p) for p, root in zip(params_for_plots, roots)]
        else:
            if not params:
                raise GetDistPlotError("No parameters for plot_3d!")
            params = self.get_param_array(roots[0], params)
            params_for_plots = [params for _ in roots]
        ax = self.get_axes(ax, pars=params_for_plots[0])
        contour_args = self._make_contour_args(len(roots) - 1, **kwargs)
        xlims, ylims = self.add_3d_scatter(
            roots[0], params_for_plots[0], color_bar=color_bar, alpha_samples=alpha_samples, ax=ax, **kwargs
        )
        for i, root in enumerate(roots[1:]):
            params = params_for_plots[i + 1]
            res = self.add_2d_contours(
                root, params[0], params[1], i + line_offset, add_legend_proxy=add_legend_proxy, zorder=i + 1, ax=ax, **contour_args[i]
            )
            xlims, ylims = self._update_limits(res, xlims, ylims)
        if "lims" not in kwargs:
            params = params_for_plots[0]
            lim1 = self._check_param_ranges(roots[0], params[0].name, xlims[0], xlims[1])
            lim2 = self._check_param_ranges(roots[0], params[1].name, ylims[0], ylims[1])
            kwargs["lims"] = [lim1[0], lim1[1], lim2[0], lim2[1]]
        self.set_axes(params, ax=ax, **kwargs)
        if not _no_finish and self.plot_row == 1 and self.plot_col == 1:
            self.finish_plot()

    def plot_2d_scatter(self, roots, param1, param2, color="k", line_offset=0, add_legend_proxy=True, **kwargs):
        """2D scatter plot (extra roots plotted as contour lines)."""
        kwargs = kwargs.copy()
        kwargs["fixed_color"] = color
        self.plot_3d(
            roots, [param1, param2], color_bar=False, line_offset=line_offset, add_legend_proxy=add_legend_proxy, **kwargs
        )

    def add_3d_scatter(
        self, root, params, color_bar=True, alpha=1, extra_thin=1, scatter_size=None, ax=None, alpha_samples=False, **kwargs
    ):
        """Add a scatter colored by a third parameter (see reference
        ``plots.py:3227-3324``)."""
        ax = self.get_axes(ax)
        params = self.get_param_array(root, params)
        if alpha_samples:
            mcsamples = self.sample_analyser.samples_for_root(root)
            weights, pts = mcsamples.weights, mcsamples.samples
        else:
            pts = self.sample_analyser.load_single_samples(root)
            weights = 1
            mcsamples = None
        names = self.param_names_for_root(root)
        samples = []
        for param in params:
            if hasattr(param, "getDerived"):
                samples.append(param.getDerived(self._make_param_object(names, pts)))
            else:
                samples.append(pts[:, names.numberOfName(param.name)])
        fixed_color = kwargs.get("fixed_color")
        if mcsamples:
            # plot most samples, alpha-weighted by multiplicity
            from matplotlib.cm import ScalarMappable
            from matplotlib.colors import Normalize, to_rgb

            max_weight = np.max(weights)
            dup_fac = 4
            filt = weights > max_weight / (100 * dup_fac)
            x = samples[0][filt]
            y = samples[1][filt]
            z = samples[2][filt]
            weights = weights[filt] / max_weight * dup_fac
            intweights = np.ceil(weights)
            thin_ix = mcsamples.thin_indices(1, intweights)
            x = x[thin_ix]
            y = y[thin_ix]
            z = z[thin_ix]
            weights /= intweights
            weights = weights[thin_ix]
            mappable = ScalarMappable(Normalize(z.min(), z.max()), self.settings.colormap_scatter)
            mappable.set_array(z)
            cols = mappable.to_rgba(z)
            if fixed_color:
                cols[:, :3] = to_rgb(fixed_color)
            cols[:, 3] = weights / dup_fac * alpha
            alpha = None
            self.last_scatter = mappable
            ax.scatter(x, y, edgecolors="none", s=scatter_size or self.settings.scatter_size, c=cols, alpha=alpha)
        else:
            if extra_thin > 1:
                samples = [pts[::extra_thin] for pts in samples]
            self.last_scatter = ax.scatter(
                samples[0],
                samples[1],
                edgecolors="none",
                s=scatter_size or self.settings.scatter_size,
                c=fixed_color or samples[2],
                cmap=None if fixed_color else self.settings.colormap_scatter,
                alpha=alpha,
            )
        if color_bar and not fixed_color:
            self.last_colorbar = self.add_colorbar(params[2], mappable=self.last_scatter, ax=ax, **kwargs)
        xbounds = [min(samples[0]), max(samples[0])]
        r = xbounds[1] - xbounds[0]
        xbounds[0] -= r / 20
        xbounds[1] += r / 20
        ybounds = [min(samples[1]), max(samples[1])]
        r = ybounds[1] - ybounds[0]
        ybounds[0] -= r / 20
        ybounds[1] += r / 20
        return [xbounds, ybounds]

    def add_2d_scatter(self, root, x, y, color="k", alpha=1, extra_thin=1, scatter_size=None, ax=None):
        """Add a plain 2D sample scatter."""
        kwargs = {"fixed_color": color}
        return self.add_3d_scatter(root, [x, y], False, alpha, extra_thin, scatter_size, ax, **kwargs)

    def add_colorbar_label(self, cb, param, label_rotation=None):
        """Set the colorbar label from a parameter's latex label."""
        label_rotation = label_rotation or self.settings.colorbar_label_rotation
        kwargs = {}
        if label_rotation and (10 < -label_rotation < 170):
            kwargs["va"] = "bottom"
        cb.set_label(
            param.latexLabel(),
            fontsize=self._scaled_fontsize(self.settings.axes_labelsize),
            rotation=label_rotation,
            labelpad=self.settings.colorbar_label_pad,
            **kwargs,
        )

    def add_line(self, xdata, ydata, zorder=0, color=None, ls=None, ax=None, **kwargs):
        """Add a Line2D to the axes."""
        if color is None:
            color = self.settings.axis_marker_color
        if ls is None:
            ls = self.settings.axis_marker_ls
        self.get_axes(ax).add_line(matplotlib.lines.Line2D(xdata, ydata, color=color, ls=ls, zorder=zorder, **kwargs))

    def add_colorbar(self, param, orientation="vertical", mappable=None, ax=None, colorbar_args=empty_dict, **ax_args):
        """Add a color bar labelled by a parameter."""
        kwargs = {"orientation": orientation}
        kwargs.update(colorbar_args)
        cb = self.fig.colorbar(mappable, ax=self.get_axes(ax), **kwargs)
        cb.set_alpha(1)
        if not ax_args.get("color_label_in_axes"):
            self.add_colorbar_label(cb, param)
        self._set_axis_properties(
            cb.ax.yaxis if orientation == "vertical" else cb.ax.xaxis,
            self.settings.colorbar_tick_rotation or 0,
            self.settings.colorbar_axes_fontsize,
        )
        return cb

    def rotate_yticklabels(self, ax=None, rotation=90, labelsize=None):
        """Rotate y tick labels."""
        self._set_axis_properties(self.get_axes(ax).yaxis, rotation, labelsize)

    def rotate_xticklabels(self, ax=None, rotation=90, labelsize=None):
        """Rotate x tick labels."""
        self._set_axis_properties(self.get_axes(ax).xaxis, rotation, labelsize)

    def rectangle_plot(
        self,
        xparams,
        yparams,
        yroots=None,
        roots=None,
        plot_roots=None,
        plot_texts=None,
        xmarkers=None,
        ymarkers=None,
        marker_args=empty_dict,
        param_limits=empty_dict,
        legend_labels=None,
        legend_ncol=None,
        label_order=None,
        **kwargs,
    ):
        """Grid of 2D plots: all xparams against all yparams (see reference
        ``plots.py:2990-3115``)."""
        if sum(map(bool, (roots, yroots, plot_roots))) > 1:
            raise GetDistPlotError("rectangle plot: must have one of roots, yroots, plot_roots")
        xparams = makeList(xparams)
        yparams = makeList(yparams)
        if roots:
            roots = makeList(roots)
        self.make_figure(nx=len(xparams), ny=len(yparams), sharex=bool(yparams), sharey=bool(xparams))

        last_row = len(yparams) - 1
        limits = dict()
        yshares = []  # first-column axes, y-range owners per row
        xshares = []  # first-row axes, x-range owners per column
        ax_arr = []
        for x, xparam in enumerate(xparams):
            # roots per cell in this column
            if plot_roots:
                column_roots = plot_roots[x]
            elif roots:
                column_roots = [roots] * len(yparams)
            else:
                column_roots = yroots
            xmarker = self._get_marker(xmarkers, x, xparam)
            column_axes = []
            for y, (yparam, cell_roots) in enumerate(zip(yparams, column_roots)):
                ax = self._subplot(
                    x,
                    y,
                    pars=(xparam, yparam),
                    sharex=column_axes[0] if y > 0 else None,
                    sharey=yshares[y] if x > 0 else None,
                )
                if y == 0:
                    xshares.append(ax)
                if x == 0:
                    yshares.append(ax)
                bounds = self.plot_2d(
                    cell_roots,
                    param_pair=[xparam, yparam],
                    do_xlabel=y == last_row,
                    do_ylabel=x == 0,
                    add_legend_proxy=x == 0 and y == 0,
                    ax=ax,
                    **kwargs,
                )
                if xmarker is not None:
                    self.add_x_marker(xmarker, ax=ax, **marker_args)
                ymarker = self._get_marker(ymarkers, y, yparam)
                if ymarker is not None:
                    self.add_y_marker(ymarker, ax=ax, **marker_args)
                limits[xparam], limits[yparam] = self._update_limits(
                    bounds, limits.get(xparam), limits.get(yparam)
                )
                if y != last_row:
                    self._no_x_ticklabels(ax)
                if x != 0:
                    self._no_y_ticklabels(ax)
                if plot_texts and plot_texts[x][y]:
                    self.add_text_left(plot_texts[x][y], y=0.9, ax=ax)
                self._inner_ticks(ax)
                column_axes.append(ax)
            ax_arr.append(column_axes)

        for xparam, ax in zip(xparams, xshares):
            ax.set_xlim(param_limits.get(xparam, limits[xparam]))
        for yparam, ax in zip(yparams, yshares):
            ax.set_ylim(param_limits.get(yparam, limits[yparam]))
        self._subplots_adjust()
        if roots:
            legend_labels = self._default_legend_labels(legend_labels, roots)
        self.finish_plot(
            legend_labels=legend_labels,
            label_order=label_order,
            legend_ncol=legend_ncol or self.settings.figure_legend_ncol or len(legend_labels or []),
        )
        return ax_arr

    # -- ticks/colorbars/scatter ---------------------------------------------

    @staticmethod
    def _sync_x_from_y(_ax):
        # keep a diagonal/first-column partner's x range equal to our y range
        _lims = _ax.get_ylim()
        other = _ax._shared_x_axis
        if other is not None and _lims != other.get_xlim():
            other.set_xlim(_lims)

    @staticmethod
    def _sync_y_from_x(_ax):
        _lims = _ax.get_xlim()
        other = _ax._shared_y_axis
        if other is not None and _lims != other.get_ylim():
            other.set_ylim(_lims)

    def _tie_axis(self, ax, partner, via_x):
        """Register a lim-changed callback propagating to a partner axis."""
        if via_x:
            ax._shared_y_axis = partner
            ax.callbacks.connect("xlim_changed", self._sync_y_from_x)
        else:
            ax._shared_x_axis = partner
            ax.callbacks.connect("ylim_changed", self._sync_x_from_y)

    def _line_args_from_contours(self, cont_args, cont_colors):
        """1D line colors implied by the 2D contour style set."""
        cols = []
        for plotno, _arg in enumerate(cont_args):
            if _arg.get("filled"):
                cols.append(
                    _arg.get("color")
                    or self._get_color_at_index(self.settings.solid_colors, len(cont_args) - plotno - 1)
                )
            elif cont_colors is not None and len(cont_colors) > plotno:
                cols.append(cont_colors[plotno])
            else:
                cols.append(None)
        made = []
        for col in cols:
            if col is None:
                made.append({})
                continue
            if isinstance(col, (tuple, list)) and not matplotlib.colors.is_color_like(col):
                col = col[-1]
            made.append({"color": col})
        return made

    def _triangle_upper_styles(self, upper_roots, upper_kwargs, filled, contour_args, contour_colors, contour_ls, contour_lws):
        """(contour args, line args) for the upper-triangle sample sets."""
        upper_contour_args = self._make_contour_args(
            len(upper_roots),
            filled=upper_kwargs.get("filled", filled),
            contour_args=upper_kwargs.get("contour_args", contour_args),
            colors=upper_kwargs.get("contour_colors", contour_colors),
            ls=upper_kwargs.get("contour_ls", contour_ls),
            lws=upper_kwargs.get("contour_lws", contour_lws),
        )
        upper_line_args = upper_kwargs.get("line_args") or self._line_args_from_contours(
            upper_contour_args, upper_kwargs.get("contour_colors", contour_colors)
        )
        upargs = self._make_line_args(
            len(upper_roots),
            line_args=upper_line_args,
            ls=upper_kwargs.get("contour_ls", contour_ls),
            lws=upper_kwargs.get("contour_lws", contour_lws),
        )
        return upper_contour_args, upargs

    def _triangle_upper_label_axis(self, params, lims, upper_label_right, bottom):
        """Axis carrying the first-row y label; a left twin unless labels go
        on the right."""
        if upper_label_right:
            return self.subplots[0, bottom]
        label_ax = self.subplots[0, 0].twinx()
        self._inner_ticks(label_ax)
        label_ax.yaxis.tick_left()
        label_ax.yaxis.set_label_position("left")
        label_ax.yaxis.set_offset_position("left")
        label_ax.set_ylim(lims[0])
        self.set_ylabel(params[0], ax=label_ax)
        self._set_main_axis_properties(label_ax.yaxis, False)
        self.subplots[0, 0].yaxis.set_visible(False)
        return label_ax

    def _triangle_colorbar(self, n_params, col_param):
        bottom_frac = 0.6 if n_params == 2 else 0.5
        cb = self.fig.colorbar(self.last_scatter, cax=self.fig.add_axes([0.9, bottom_frac, 0.03, 0.35]))
        cb.ax.yaxis.set_ticks_position("left")
        cb.ax.yaxis.set_label_position("left")
        self.rotate_yticklabels(
            cb.ax,
            rotation=self.settings.colorbar_tick_rotation or 0,
            labelsize=self.settings.colorbar_axes_fontsize,
        )
        self.add_colorbar_label(cb, col_param, label_rotation=-self.settings.colorbar_label_rotation)

    def triangle_plot(
        self,
        roots,
        params=None,
        legend_labels=None,
        plot_3d_with_param=None,
        filled=False,
        shaded=False,
        contour_args=None,
        contour_colors=None,
        contour_ls=None,
        contour_lws=None,
        line_args=None,
        label_order=None,
        legend_ncol=None,
        legend_loc=None,
        title_limit=None,
        upper_roots=None,
        upper_kwargs=empty_dict,
        upper_label_right=False,
        diag1d_kwargs=empty_dict,
        markers=None,
        marker_args=empty_dict,
        param_limits=empty_dict,
        **kwargs,
    ):
        """Triangle (corner) plot: 1D densities on the diagonal, 2D contours
        below, optional second set of samples above (see reference
        ``plots.py:2613-2988`` for the full argument list)."""
        roots = makeList(roots)
        params = self.get_param_array(roots, params)
        plot_col = len(params)
        bottom = plot_col - 1
        if plot_3d_with_param is not None:
            col_param = self._check_param(roots[0], plot_3d_with_param)
        share_all = self.settings.no_triangle_axis_labels
        self.make_figure(nx=plot_col, ny=plot_col, sharex=share_all, sharey=share_all)
        if kwargs.pop("filled_compare", False):
            filled = True

        if upper_roots is not None:
            if plot_3d_with_param is not None:
                logging.warning("triangle_plot upper_roots currently doesn't work with plot_3d_with_param")
            upper_contour_args, upargs = self._triangle_upper_styles(
                upper_roots, upper_kwargs, filled, contour_args, contour_colors, contour_ls, contour_lws
            )

        contour_args = self._make_contour_args(
            len(roots), filled=filled, contour_args=contour_args, colors=contour_colors, ls=contour_ls, lws=contour_lws
        )
        if line_args is None:
            line_args = self._line_args_from_contours(contour_args, contour_colors)
        line_args = self._make_line_args(len(roots), line_args=line_args, ls=contour_ls, lws=contour_lws)

        # upper-triangle-only sample sets can also appear on the diagonal
        roots1d = copy.copy(roots)
        if upper_roots is not None:
            show_1d = upper_kwargs.get("show_1d", True)
            if isinstance(show_1d, bool):
                show_1d = [show_1d] * len(upargs)
            for root, arg, show in zip(upper_roots, upargs, show_1d):
                if show and root not in roots1d:
                    roots1d.append(root)
                    line_args.append(arg)

        # create the grid column by column (lower cells then the diagonal)
        # and draw the diagonal 1D plots, collecting per-parameter x ranges
        lims = dict()
        for i, param in enumerate(params):
            for i2 in range(bottom, i, -1):
                self._subplot(
                    i,
                    i2,
                    pars=(param, params[i2]),
                    sharex=self.subplots[bottom, i] if i2 != bottom else None,
                    sharey=self.subplots[i2, 0] if i > 0 else None,
                )
            ax = self._subplot(i, i, pars=(param,), sharex=self.subplots[bottom, i] if i != bottom else None)
            self._inner_ticks(ax, False)
            lims[i] = self.plot_1d(
                roots1d,
                param,
                marker=self._get_marker(markers, i, param.name),
                do_xlabel=i == plot_col - 1,
                no_label_no_numbers=share_all,
                title_limit=title_limit,
                label_right=True,
                no_zero=True,
                no_ylabel=True,
                no_ytick=True,
                line_args=line_args,
                lims=param_limits.get(param.name),
                ax=ax,
                _ret_range=True,
                marker_args=marker_args,
                **diag1d_kwargs,
            )
            if i > 0:
                self._tie_axis(ax, self.subplots[i, 0], via_x=True)

        if upper_roots is not None:
            label_ax = self._triangle_upper_label_axis(params, lims, upper_label_right, bottom)
            for y, param in enumerate(params[:-1]):
                for x in range(bottom, y, -1):
                    if y > 0:
                        share = self.subplots[y, 0]
                    else:
                        share = label_ax if (y < bottom or not upper_label_right) else None
                    self._subplot(x, y, pars=(params[x], param), sharex=self.subplots[bottom, x], sharey=share)

        for i, param in enumerate(params):
            marker = self._get_marker(markers, i, param.name)
            for i2 in range(i + 1, plot_col):
                param2 = params[i2]
                marker2 = self._get_marker(markers, i2, param2.name)
                ax = self.subplots[i2, i]
                if plot_3d_with_param is not None:
                    self.plot_3d(
                        roots,
                        [param, param2, col_param],
                        color_bar=False,
                        line_offset=1,
                        add_legend_proxy=False,
                        do_xlabel=i2 == plot_col - 1,
                        do_ylabel=i == 0,
                        contour_args=contour_args,
                        no_label_no_numbers=share_all,
                        ax=ax,
                        **kwargs,
                    )
                else:
                    self.plot_2d(
                        roots,
                        param_pair=[param, param2],
                        do_xlabel=i2 == plot_col - 1,
                        do_ylabel=i == 0,
                        no_label_no_numbers=share_all,
                        shaded=shaded,
                        add_legend_proxy=i == 0 and i2 == 1,
                        contour_args=contour_args,
                        ax=ax,
                        **kwargs,
                    )
                if marker is not None:
                    self._add_marker_list(marker, ax, marker_args)
                if marker2 is not None:
                    self._add_marker_list(marker2, ax, marker_args, y=True)
                self._inner_ticks(ax)
                if i != i2:
                    ax.set_ylim(lims[i2])
                self._tie_axis(ax, self.subplots[bottom, i2], via_x=False)
                if i2 == bottom:
                    ax.set_xlim(lims[i])
                if i > 0:
                    self._tie_axis(ax, self.subplots[i, 0], via_x=True)

                if upper_roots is not None:
                    if i == 0:
                        self._tie_axis(ax, label_ax, via_x=True)
                    self._triangle_upper_cell(
                        upper_roots,
                        params,
                        i,
                        i2,
                        bottom,
                        lims,
                        marker,
                        marker2,
                        marker_args,
                        upper_contour_args,
                        upper_label_right,
                        shaded,
                        plot_3d_with_param,
                        col_param if plot_3d_with_param is not None else None,
                        roots,
                    )

        self._subplots_adjust()
        if plot_3d_with_param is not None:
            self._triangle_colorbar(plot_col, col_param)
        self._triangle_legend(
            roots1d, params, legend_labels, legend_loc, legend_ncol, label_order, title_limit, upper_roots
        )

    def _triangle_upper_cell(
        self,
        upper_roots,
        params,
        i,
        i2,
        bottom,
        lims,
        marker,
        marker2,
        marker_args,
        upper_contour_args,
        upper_label_right,
        shaded,
        plot_3d_with_param,
        col_param,
        roots,
    ):
        """One mirrored cell above the diagonal (second sample set)."""
        ax = self.subplots[i, i2]
        pair = [params[i2], params[i]]
        right_edge_label = upper_label_right and i2 == bottom
        if plot_3d_with_param is not None:
            self.plot_3d(
                upper_roots,
                pair + [col_param],
                color_bar=False,
                line_offset=1,
                add_legend_proxy=False,
                ax=ax,
                do_xlabel=False,
                do_ylabel=right_edge_label,
                contour_args=upper_contour_args,
                no_label_no_numbers=self.settings.no_triangle_axis_labels,
            )
        else:
            self.plot_2d(
                upper_roots,
                param_pair=pair,
                do_xlabel=False,
                do_ylabel=right_edge_label,
                no_label_no_numbers=self.settings.no_triangle_axis_labels,
                shaded=shaded,
                add_legend_proxy=i == 0 and i2 == 1,
                ax=ax,
                proxy_root_exclude=[root for root in upper_roots if root in roots],
                contour_args=upper_contour_args,
            )
        if marker is not None:
            self.add_y_marker(marker, ax=ax, **marker_args)
        if marker2 is not None:
            self.add_x_marker(marker2, ax=ax, **marker_args)
        if right_edge_label:
            ax.yaxis.set_label_position("right")
            ax.yaxis.set_offset_position("right")
            ax.yaxis.set_tick_params(which="both", labelright=True, labelleft=False)
            self.set_ylabel(params[i], ax=ax, rotation=-90, va="bottom")
        ax.set_xlim(lims[i2])
        ax.set_ylim(lims[i])
        self._tie_axis(ax, self.subplots[bottom, i], via_x=False)
        self._inner_ticks(ax)

    def _triangle_legend(
        self, roots1d, params, legend_labels, legend_loc, legend_ncol, label_order, title_limit, upper_roots
    ):
        labels = self._default_legend_labels(legend_labels, roots1d)
        if (
            not legend_loc
            and self.settings.figure_legend_loc == "upper center"
            and len(params) < 4
            and upper_roots is None
        ):
            legend_loc = "upper right"
        else:
            legend_loc = legend_loc or self.settings.figure_legend_loc
        args = {}
        if "upper" in legend_loc and upper_roots is None:
            args["bbox_to_anchor"] = (self.plot_col / (2 if "center" in legend_loc else 1), 1)
            args["bbox_transform"] = self.subplots[0, 0].transAxes
            args["borderaxespad"] = 0
        self.finish_plot(
            labels,
            label_order=label_order,
            legend_ncol=legend_ncol
            or self.settings.figure_legend_ncol
            or (None if upper_roots is None else len(labels)),
            legend_loc=legend_loc,
            no_extra_legend_space=upper_roots is None,
            no_tight=title_limit or self.settings.title_limit,
            **args,
        )


    def _add_marker_list(self, markers, ax, marker_args, y=False, color=None):
        add_proc = self.add_y_marker if y else self.add_x_marker
        if isinstance(marker_args, (list, tuple)):
            for marker, marker_arg in zip(makeList(markers), marker_args):
                if color:
                    marker_arg["color"] = color
                add_proc(marker, ax=ax, **marker_arg)
        else:
            if color:
                marker_args["color"] = color
            add_proc(markers, ax=ax, **marker_args)

    # -- triangle / rectangle -----------------------------------------------

    @staticmethod
    def _make_param_object(names, samples, obj=None):
        class SampleNames:
            pass

        obj = obj or SampleNames()
        for i, par in enumerate(names.names):
            setattr(obj, par.name, samples[:, i])
        return obj

    @staticmethod
    def _get_marker(markers, index, name):
        if markers is not None:
            if isinstance(markers, Mapping):
                return markers.get(name)
            elif index < len(markers):
                return markers[index]
        return None

    @staticmethod
    def _inner_ticks(ax, top_and_left=True):
        for axis in [ax.get_xaxis(), ax.get_yaxis()]:
            axis.set_tick_params(which="both", direction="in", right=top_and_left, top=top_and_left)

    def _auto_ticks(self, axis, max_ticks=None, prune=True):
        axis.set_major_locator(
            BoundedMaxNLocator(
                nbins=max_ticks or self.settings.axis_tick_max_labels,
                prune=prune,
                step_groups=self.settings.axis_tick_step_groups,
            )
        )

    def _subplot_number(self, i, pars=None, **kwargs):
        if self.fig is None and i == 0:
            self.make_figure()
        return self._subplot(i % self.plot_col, i // self.plot_col, pars=pars, **kwargs)

    def _subplot(self, x, y, pars=None, **kwargs):
        ax = self.subplots[y, x]
        if not ax or "projection" in kwargs:
            self.subplots[y, x] = ax = self.fig.add_subplot(self.gridspec[y, x], **kwargs)
        if pars is not None:
            ax.getdist_params = pars
        self._last_ax = ax
        return ax

    def get_axes(self, ax=None, pars=None):
        """Axes for a subplot coordinate/parameter tuple (or last used)."""
        if isinstance(ax, int):
            ax = self._subplot_number(ax)
        elif isinstance(ax, (list, tuple)):
            if isinstance(ax[0], str) or isinstance(ax[0], ParamInfo):
                ax = self.get_axes_for_params(*ax)
            else:
                ax = self._subplot(ax[1], ax[0])
        else:
            ax = ax or self._last_ax
            if not ax:
                if self.fig and len(self.fig.axes):
                    ax = self.fig.axes[0]
                    if self.subplots[0, 0] is None:
                        self._last_ax = ax
                        self.subplots[0, 0] = ax
                else:
                    ax = self._subplot_number(0)
        if pars is not None and ax is not None:
            ax.getdist_pars = pars
        return ax

    def plots_2d_triplets(self, root_params_triplets, nx=None, filled=False, x_lim=None):
        """Array of 2D plots with different samples/parameters per subplot."""
        plot_col, plot_row = self.make_figure(len(root_params_triplets), nx=nx)
        for i, (root, param1, param2) in enumerate(root_params_triplets):
            ax = self._subplot_number(i, pars=(param1, param2))
            self.plot_2d(
                root, param_pair=[param1, param2], filled=filled, add_legend_proxy=i == 0, ax=ax, _no_finish=True
            )
            if x_lim is not None:
                ax.set_xlim(x_lim)
        self.finish_plot()
        return plot_col, plot_row

    def plots_2d(
        self,
        roots,
        param1=None,
        params2=None,
        param_pairs=None,
        nx=None,
        legend_labels=None,
        legend_ncol=None,
        label_order=None,
        filled=False,
        shaded=False,
        **kwargs,
    ):
        """Array of 2D subplots (see reference ``plots.py:2404-2483``)."""
        pairs = []
        roots = makeList(roots)
        if isinstance(param1, (list, tuple)) and len(param1) == 2:
            params2 = [param1[1]]
            param1 = param1[0]
        if param_pairs is None:
            if param1 is not None:
                param1 = self._check_param(roots, param1)
                params2 = self.get_param_array(roots, params2)
                for param in params2:
                    if param.name != param1.name:
                        pairs.append((param1, param))
            else:
                raise GetDistPlotError("No parameter or parameter pairs for 2D plot")
        else:
            for pair in param_pairs:
                pairs.append((self._check_param(roots, pair[0]), self._check_param(roots, pair[1])))
        if filled and shaded:
            raise GetDistPlotError("Plots cannot be both filled and shaded")
        plot_col, plot_row = self.make_figure(len(pairs), nx=nx)
        for i, pair in enumerate(pairs):
            ax = self._subplot_number(i, pars=pair)
            self.plot_2d(
                roots,
                param_pair=pair,
                filled=filled,
                shaded=not filled and shaded,
                add_legend_proxy=i == 0,
                ax=ax,
                _no_finish=True,
                **kwargs,
            )
        self.finish_plot(
            self._default_legend_labels(legend_labels, roots), legend_ncol=legend_ncol, label_order=label_order
        )
        return plot_col, plot_row

    def plots_1d(
        self,
        roots,
        params=None,
        legend_labels=None,
        legend_ncol=None,
        label_order=None,
        nx=None,
        param_list=None,
        roots_per_param=False,
        share_y=None,
        markers=None,
        title_limit=None,
        xlims=None,
        param_renames=None,
        **kwargs,
    ):
        """Array of 1D subplots (see reference ``plots.py:2298-2402``)."""
        roots = makeList(roots)
        if roots_per_param:
            params = [self._check_param(root, param, param_renames) for root, param in zip(roots, params)]
        else:
            params = self.get_param_array(roots, params, param_renames)
        if param_list is None:
            param_list = kwargs.pop("paramList", None)
        if param_list is not None:
            wanted_params = ParamNames(param_list).list()
            params = [
                param
                for param in params
                if param.name in wanted_params or param_renames and param_renames.get(param.name, "") in wanted_params
            ]
        nparam = len(params)
        if share_y is None:
            share_y = self.settings.prob_label is not None and nparam > 1
        elif nx is None and len(params) < 6:
            nx = len(params)
        plot_col, plot_row = self.make_figure(nparam, nx=nx, sharey=share_y)
        plot_roots = roots
        for i, param in enumerate(params):
            ax = self._subplot_number(
                i,
                pars=(param,),
                sharey=None if (i == 0 or not share_y or self.settings.norm_1d_density) else self.subplots[0, 0],
            )
            if roots_per_param:
                plot_roots = roots[i]
            marker = self._get_marker(markers, i, param.name)
            no_ticks = share_y and i % self.plot_col > 0
            self.plot_1d(
                plot_roots,
                param,
                no_ytick=no_ticks,
                no_ylabel=no_ticks,
                marker=marker,
                param_renames=param_renames,
                title_limit=title_limit,
                ax=ax,
                _no_finish=True,
                **kwargs,
            )
            if xlims is not None:
                ax.set_xlim(xlims[i][0], xlims[i][1])
        self.finish_plot(
            self._default_legend_labels(legend_labels, roots), legend_ncol=legend_ncol, label_order=label_order
        )
        return plot_col, plot_row

    def _default_legend_labels(self, legend_labels, roots):
        if legend_labels is None:
            if len(roots) < 2:
                return []
            return [self._root_display_name(root, i) for i, root in enumerate(roots) if root is not None]
        return legend_labels

    # -- subplot arrays -------------------------------------------------------

    def _root_display_name(self, root, i):
        if hasattr(root, "get_label"):
            root = root.get_label()
        elif hasattr(root, "getLabel"):
            root = root.getLabel()
        elif hasattr(root, "label"):
            root = root.label
        elif hasattr(root, "get_name"):
            root = escapeLatex(root.get_name())
        elif hasattr(root, "getName"):
            root = escapeLatex(root.getName())
        elif isinstance(root, str):
            label = self._root_display_name(self.sample_analyser.samples_for_root(root), i)
            if label in root and "/" in root:
                return escapeLatex(root)
            return label
        if not root:
            root = "samples" + str(i)
        return root

    def finish_plot(
        self,
        legend_labels=None,
        legend_loc=None,
        line_offset=0,
        legend_ncol=None,
        label_order=None,
        no_extra_legend_space=False,
        no_tight=False,
        **legend_args,
    ):
        """Finalize spacing and add the figure legend if required."""
        has_legend = self.settings.line_labels and legend_labels is not None and len(legend_labels) > 0
        if self.settings.tight_layout and not self.settings.constrained_layout and not no_tight:
            self._tight_layout()
        if has_legend:
            self.extra_artists = [
                self.add_legend(
                    legend_labels,
                    legend_loc or self.settings.figure_legend_loc,
                    line_offset,
                    legend_ncol,
                    label_order=label_order,
                    figure=True,
                    figure_legend_outside=not no_extra_legend_space,
                    **legend_args,
                )
            ]
        self._subplots_adjust()

    def _tight_layout(self, rect=None):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            self.gridspec.tight_layout(
                self.fig, h_pad=self._share_kwargs.get("h_pad"), w_pad=self._share_kwargs.get("w_pad"), rect=rect
            )

    def _subplots_adjust(self):
        if not self.settings.constrained_layout and self._share_kwargs:
            self.fig.subplots_adjust(wspace=self._share_kwargs.get("wspace"), hspace=self._share_kwargs.get("hspace"))

    def _scaled_linewidth(self, linewidth):
        return self.settings.scaled_linewidth(self._ax_width, linewidth)

    def _scaled_fontsize(self, var, default=None):
        return self.settings.scaled_fontsize(self._ax_width, var, default)

    def add_legend(
        self,
        legend_labels,
        legend_loc=None,
        line_offset=0,
        legend_ncol=None,
        colored_text=None,
        figure=False,
        ax=None,
        label_order=None,
        align_right=False,
        fontsize=None,
        figure_legend_outside=True,
        **kwargs,
    ):
        """Add a legend to the axes or figure (see reference
        ``plots.py:2065-2199``)."""
        if legend_loc is None:
            legend_loc = self.settings.figure_legend_loc if figure else self.settings.legend_loc
        if colored_text is None:
            colored_text = self.settings.legend_colored_text
        lines = self._legend_handles(legend_labels, line_offset, figure, ax)

        args = kwargs.copy()
        args["ncol"] = legend_ncol or self.settings.figure_legend_ncol or 1
        size = self._scaled_fontsize(fontsize or self.settings.legend_fontsize or self.settings.axes_labelsize)
        args["prop"] = {"size": size}
        if colored_text:
            args["handlelength"] = 0
            args["handletextpad"] = 0
        if label_order is not None:
            if str(label_order) == "-1":
                label_order = list(reversed(range(len(lines))))
            lines = [lines[i] for i in label_order]
            legend_labels = [legend_labels[i] for i in label_order]

        if figure:
            if figure_legend_outside and args.get("bbox_to_anchor") is None:
                legend_loc = self._anchor_figure_legend(legend_loc, args)
            self.legend = self.fig.legend(lines, legend_labels, loc=legend_loc, **args)
            if not self.settings.figure_legend_frame:
                self.legend.get_frame().set_edgecolor("none")
        else:
            args["frameon"] = self.settings.legend_frame and not colored_text
            self.legend = self.get_axes(ax).legend(lines, legend_labels, loc=legend_loc, **args)
        self._style_legend(colored_text, align_right)
        return self.legend

    def _legend_handles(self, legend_labels, line_offset, figure, ax):
        """Proxy artists for the legend: registered contour proxies when any
        contours were drawn, otherwise per-line styles / existing axis lines."""
        if self.contours_added:
            handles = self.contours_added
            for i, entry in enumerate(handles):
                if entry is None:
                    args = self.lines_added.get(i)
                    if args:
                        args.pop("filled", None)
                        handles[i] = matplotlib.lines.Line2D([0, 1], [0, 1], **args)
            return handles
        handles = []
        for i in range(len(legend_labels)):
            args = self.lines_added.get(i)
            if not args:
                if not figure:
                    ax_lines = self.get_axes(ax).lines
                    if len(ax_lines) > i:
                        handles.append(ax_lines[i])
                        continue
                args = self._get_line_styles(i + line_offset)
            args.pop("filled", None)
            handles.append(matplotlib.lines.Line2D([0, 1], [0, 1], **args))
        return handles

    def _anchor_figure_legend(self, legend_loc, args):
        """Anchor an outside-the-subplots figure legend; mutates args and
        returns the flipped location string."""
        if legend_loc in ["best", "center"]:
            legend_loc = "upper center"
        loc1, loc2 = legend_loc.split(" ")
        if loc1 == "center":
            raise ValueError("Cannot use centre location for figure legend outside")
        frac = self.settings.legend_frac_subplot_margin
        if loc1 == "upper":
            x = 0 if loc2 == "left" else (self.plot_col if loc2 == "right" else self.plot_col / 2)
            args["bbox_to_anchor"] = (x, 1 + frac)
            args["bbox_transform"] = self.subplots[0, 0].transAxes
        else:
            x = 0 if loc2 == "left" else (1 if loc2 == "right" else 0.5)
            args["bbox_to_anchor"] = (x, -frac / self.plot_row)
            args["bbox_transform"] = self.fig.transFigure
        args["borderaxespad"] = 0
        # anchor from the opposite edge so the box hangs outside the grid
        flipped = ("upper", "center", "lower")[["lower", "center", "upper"].index(loc1)]
        return flipped + " " + loc2

    def _style_legend(self, colored_text, align_right):
        if align_right:
            vp = self.legend._legend_box._children[-1]._children[0]
            for c in vp._children:
                c._children.reverse()
            vp.align = "right"
        if not self.settings.legend_rect_border:
            for rect in self.legend.get_patches():
                rect.set_edgecolor(rect.get_facecolor())
        if not colored_text:
            return
        for handle, text in zip(self.legend.legend_handles, self.legend.get_texts()):
            handle.set_visible(False)
            if isinstance(handle, matplotlib.lines.Line2D):
                text.set_color(handle.get_color())
            elif isinstance(handle, matplotlib.patches.Patch):
                text.set_color(handle.get_facecolor())

    def param_latex_label(self, root, name, label_params=None):
        """Latex label for a parameter of a root."""
        if label_params is not None:
            p = self.sample_analyser.params_for_root(root, label_params=label_params).parWithName(name)
        else:
            p = self._check_param(root, name)
        if not p:
            raise GetDistPlotError("Parameter not found: " + name)
        return p.latexLabel()

    # -- legends --------------------------------------------------------------

    def _check_param(self, root, param, renames=None):
        if isinstance(param, ParamInfo):
            name = param.name
            if hasattr(param, "renames"):
                if renames:
                    renames = {name: makeList(renames.get(name, [])) + list(param.renames)}
                else:
                    renames = {name: list(param.renames)}
        else:
            name = param
        if isinstance(root, (list, tuple)):
            if isinstance(param, ParamInfo):
                root = root[0]
            else:
                for a_root in root:
                    par = self.param_names_for_root(a_root).parWithName(name, error=a_root is root[-1], renames=renames)
                    if par is not None:
                        return par
        return self.param_names_for_root(root).parWithName(name, error=(name == param), renames=renames)

    def get_param_array(self, roots, params=None, renames: Mapping = None):
        """Resolve parameter name strings (or ParamInfo) for given root(s)
        (see reference ``plots.py:1951-2011``)."""
        root, roots = (roots[0], roots) if isinstance(roots, (list, tuple)) else (roots, [roots])
        if hasattr(root, "param_names"):
            names = root.param_names
        elif hasattr(root, "paramNames"):
            names = root.paramNames
        elif hasattr(root, "names"):
            names = ParamNames(names=root.names, default=getattr(root, "dim", 0))
        else:
            names = self.param_names_for_root(root)

        if params is None or len(params) == 0:
            return names.names
        if isinstance(params, str):
            return names.parsWithNames(params, error=True, renames=renames)
        is_param_info = [isinstance(param, ParamInfo) for param in params]
        error = [not a for a in is_param_info]
        renames_from_param_info = {
            param.name: getattr(param, "renames", []) for i, param in enumerate(params) if is_param_info[i]
        }
        if renames:
            renames = mergeRenames(renames, renames_from_param_info)
        else:
            renames = renames_from_param_info
        params_names = [getattr(param, "name", param) for param in params]
        old = [(o if isinstance(o, ParamInfo) else ParamInfo(o)) for o in params]

        if len(roots) == 1:
            return [
                new or o for new, o in zip(names.parsWithNames(params_names, error=error, renames=renames), old)
            ]
        has_names = [i for i, param_name in enumerate(params_names) if names.hasParam(param_name)]
        not_names = [i for i in range(len(params)) if i not in has_names]
        if not not_names:
            return names.parsWithNames(params_names, renames=renames)
        first_params = names.parsWithNames([params_names[i] for i in has_names], renames=renames)
        extra_params = self.get_param_array(roots[1:], [params[i] for i in not_names], renames)
        result = list(params)
        for i, j in enumerate(has_names):
            result[j] = first_params[i]
        for i, j in enumerate(not_names):
            result[j] = extra_params[i]
        return result

    def make_figure(self, nplot=1, nx=None, ny=None, xstretch=1.0, ystretch=1.0, sharex=False, sharey=False):
        """New figure with one or more subplots (see reference
        ``plots.py:1903-1949``)."""
        self.new_plot()
        self.plot_col, self.plot_row = self.default_col_row(nplot, nx=nx, ny=ny)
        if self.settings.subplot_size_ratio:
            ystretch = ystretch * self.settings.subplot_size_ratio
        if self.settings.fig_width_inch is not None:
            figsize = (
                self.settings.fig_width_inch,
                (self.settings.fig_width_inch * self.plot_row * ystretch) / (self.plot_col * xstretch),
            )
            self._ax_width = self.settings.fig_width_inch / self.plot_col
        else:
            self._ax_width = self.settings.subplot_size_inch * xstretch
            figsize = (
                self.settings.subplot_size_inch * self.plot_col * xstretch,
                self.settings.subplot_size_inch * self.plot_row * ystretch,
            )
        if self.settings.constrained_layout:
            self.fig = plt.figure(figsize=figsize, constrained_layout=True)
        else:
            self.fig = plt.figure(figsize=figsize)
        self.gridspec = matplotlib.gridspec.GridSpec(nrows=self.plot_row, ncols=self.plot_col, figure=self.fig)
        self._share_kwargs = {"w_pad": 0, "wspace": 0} if sharey else {}
        if sharex:
            self._share_kwargs.update({"h_pad": 0, "hspace": 0})
        if self.settings.constrained_layout and self._share_kwargs:
            self.fig.get_layout_engine().set(**self._share_kwargs)
        self.subplots = np.ndarray((self.plot_row, self.plot_col), dtype=object)
        self.subplots[:, :] = None
        return self.plot_col, self.plot_row

    def default_col_row(self, nplot=1, nx=None, ny=None):
        """Default subplot grid shape for nplot subplots."""
        plot_col = nx or int(round(np.sqrt(nplot / 1.4)))
        plot_row = ny or (nplot + plot_col - 1) // plot_col
        return plot_col, plot_row

    def plot_2d(
        self,
        roots,
        param1=None,
        param2=None,
        param_pair=None,
        shaded=False,
        add_legend_proxy=True,
        line_offset=0,
        proxy_root_exclude=(),
        ax=None,
        mask_function: callable = None,
        **kwargs,
    ):
        """Single 2D line/contour/filled plot (see reference
        ``plots.py:1788-1888``)."""
        roots = makeList(roots)
        if isinstance(param1, (list, tuple)):
            param_pair = param1
            param1 = None
        _no_finish = kwargs.pop("_no_finish", False)
        param_pair = self.get_param_array(roots, param_pair or [param1, param2])
        ax = self.get_axes(ax, pars=param_pair)
        if self.settings.progress:
            print("plotting: ", [param.name for param in param_pair])
        if shaded is not False and not kwargs.get("filled"):
            self.add_2d_shading(roots[0 if shaded is True else shaded], *param_pair, ax=ax)
        xbounds, ybounds = None, None
        contour_args = self._make_contour_args(len(roots), **kwargs)
        for i, root in enumerate(roots):
            res = self.add_2d_contours(
                root,
                param_pair[0],
                param_pair[1],
                line_offset + i,
                of=len(roots),
                ax=ax,
                mask_function=mask_function,
                add_legend_proxy=add_legend_proxy and root not in proxy_root_exclude,
                **contour_args[i],
            )
            xbounds, ybounds = self._update_limits(res, xbounds, ybounds)
        if xbounds is not None and "lims" not in kwargs:
            lim1 = self._check_param_ranges(roots[0], param_pair[0].name, xbounds[0], xbounds[1])
            lim2 = self._check_param_ranges(roots[0], param_pair[1].name, ybounds[0], ybounds[1])
            kwargs["lims"] = [lim1[0], lim1[1], lim2[0], lim2[1]]
        self.set_axes(param_pair, ax=ax, **kwargs)
        if xbounds is None:
            return
        if not _no_finish and len(self.fig.axes) == 1:
            self.finish_plot()
        return xbounds, ybounds

    # -- figure management ----------------------------------------------------

    def plot_1d(
        self,
        roots,
        param,
        marker=None,
        marker_color=None,
        label_right=False,
        title_limit=None,
        no_ylabel=False,
        no_ytick=False,
        no_zero=False,
        normalized=False,
        param_renames=None,
        ax=None,
        **kwargs,
    ):
        """Single 1D plot of marginalized density lines (see reference
        ``plots.py:1664-1786``)."""
        roots = makeList(roots)
        ax = self.get_axes(ax, pars=(param,))
        plotparam = None
        plotroot = None
        _ret_range = kwargs.pop("_ret_range", None)
        _no_finish = kwargs.pop("_no_finish", False)
        line_args = self._make_line_args(len(roots), **kwargs)
        xmin, xmax = None, None
        for i, root in enumerate(roots):
            root_param = self._check_param(root, param, param_renames)
            if not root_param:
                continue
            bounds = self.add_1d(
                root,
                root_param,
                i,
                normalized=normalized,
                title_limit=title_limit if not i else 0,
                ax=ax,
                **line_args[i],
            )
            xmin, xmax = self._update_limit(bounds, (xmin, xmax))
            if bounds is not None and not plotparam:
                plotparam = root_param
                plotroot = root
        if plotparam is None:
            raise GetDistPlotError("No roots have parameter: " + str(param))
        if marker is not None:
            self._add_marker_list(marker, ax, kwargs.get("marker_args", {}), color=marker_color)
        if "lims" in kwargs and kwargs["lims"] is not None:
            xmin, xmax = kwargs["lims"]
        else:
            xmin, xmax = self._check_param_ranges(plotroot, plotparam.name, xmin, xmax)
        if normalized:
            mx = ax.yaxis.get_view_interval()[-1]
        else:
            mx = 1.099
        kwargs["lims"] = [xmin, xmax, 0, mx]
        self.set_axes([plotparam], ax=ax, **kwargs)

        lab = self.settings.norm_prob_label if normalized else self.settings.prob_label
        if lab and not no_ylabel:
            if label_right:
                ax.yaxis.set_label_position("right")
                ax.yaxis.tick_right()
            ax.set_ylabel(lab, fontsize=self._scaled_fontsize(self.settings.axes_labelsize))
        if no_ytick or not self.settings.prob_y_ticks:
            ax.tick_params(left=False, labelleft=False)
        elif no_ylabel:
            self._no_y_ticklabels(ax)
        elif no_zero and not normalized:
            ticks = ax.get_yticks()
            if ticks[-1] > 1:
                ticks = ticks[:-1]
            ax.set_yticks(ticks[1:])
        if _ret_range:
            return xmin, xmax
        elif not _no_finish and len(self.fig.axes) == 1:
            self.finish_plot()

    def set_zlabel(self, param, ax=None, **kwargs):
        """Set z-axis label for a parameter."""
        ax = self.get_axes(ax)
        ax.set_zlabel(param.latexLabel(), fontsize=self._scaled_fontsize(self.settings.axes_labelsize), **kwargs)

    # -- single plots ---------------------------------------------------------

    def set_ylabel(self, param, ax=None, **kwargs):
        """Set y-axis label for a parameter."""
        ax = self.get_axes(ax)
        ax.set_ylabel(param.latexLabel(), fontsize=self._scaled_fontsize(self.settings.axes_labelsize), **kwargs)

    def set_xlabel(self, param, ax=None):
        """Set x-axis label for a parameter."""
        ax = self.get_axes(ax)
        lab_fontsize = self._scaled_fontsize(self.settings.axes_labelsize)
        ax.set_xlabel(
            param.latexLabel(), fontsize=lab_fontsize, verticalalignment="baseline", labelpad=4 + lab_fontsize
        )

    def set_axes(
        self,
        params=(),
        lims=None,
        do_xlabel=True,
        do_ylabel=True,
        no_label_no_numbers=False,
        pos=None,
        color_label_in_axes=False,
        ax=None,
        **_other_args,
    ):
        """Set axis labels, ticks, limits and styles (see reference
        ``plots.py:1576-1624``)."""
        ax = self.get_axes(ax)
        if lims is not None:
            ax.axis(lims)
        if do_xlabel or not no_label_no_numbers:
            self._set_main_axis_properties(ax.xaxis, True)
        if pos is not None:
            ax.set_position(pos)
        if do_xlabel and len(params) > 0:
            self.set_xlabel(params[0], ax)
        elif no_label_no_numbers:
            self._no_x_ticklabels(ax)
        if do_ylabel or not no_label_no_numbers:
            self._set_main_axis_properties(ax.yaxis, False)
        if len(params) > 1:
            if do_ylabel:
                self.set_ylabel(params[1], ax)
            elif no_label_no_numbers:
                self._no_y_ticklabels(ax)
        if color_label_in_axes and len(params) > 2:
            self.add_text(params[2].latexLabel(), ax=ax)
        return ax

    @staticmethod
    def _no_y_ticklabels(ax):
        ax.tick_params(labelleft=False)
        ax.yaxis.offsetText.set_visible(False)

    @staticmethod
    def _no_x_ticklabels(ax):
        ax.tick_params(labelbottom=False)
        ax.xaxis.offsetText.set_visible(False)

    def _set_main_axis_properties(self, axis, x):
        self._set_axis_formatter(axis, x)
        self._set_axis_properties(axis, self.settings.axis_tick_x_rotation if x else self.settings.axis_tick_y_rotation)

    def _set_axis_properties(self, axis, rotation: float = 0, tick_label_size=None):
        tick_label_size = self._scaled_fontsize(tick_label_size, self.settings.axes_fontsize)
        axis.set_tick_params(which="major", labelrotation=rotation, labelsize=tick_label_size)
        axis.get_offset_text().set_fontsize(tick_label_size * 3 / 4 if tick_label_size > 7 else tick_label_size)
        if isinstance(axis, matplotlib.axis.YAxis):
            self._auto_ticks(axis, prune=self._share_kwargs.get("hspace") is not None)
            if abs(rotation - 90) < 45:
                for ticklabel in axis.get_ticklabels():
                    ticklabel.set_verticalalignment("center")
        else:
            self._auto_ticks(axis, prune=self._share_kwargs.get("wspace") is not None)

    def _set_axis_formatter(self, axis, x):
        power_limits = self.settings.axis_tick_powerlimits
        if not x:
            # avoid offset text on shared y axes
            ymin, ymax = axis.get_view_interval()
            if (
                max(abs(ymax), abs(ymin)) <= 10 ** (power_limits[0] + 1)
                or max(abs(ymin), abs(ymax)) >= 10 ** power_limits[1]
            ):
                axis.set_major_formatter(SciFuncFormatter())
                return
        formatter = ScalarFormatter(useOffset=False, useMathText=True)
        formatter.set_powerlimits(power_limits)
        axis.set_major_formatter(formatter)

    def _make_contour_args(self, nroots, **kwargs):
        contour_args = self._make_line_args(nroots, **kwargs)
        filled = kwargs.get("filled")
        if filled and not isinstance(filled, bool):
            for cont, fill in zip(contour_args, filled):
                cont["filled"] = fill
        for cont in contour_args:
            if cont.get("filled") is None:
                cont["filled"] = filled or False
        return contour_args

    # -- axis formatting ------------------------------------------------------

    def _make_line_args(self, nroots, **kwargs):
        line_args = kwargs.get("line_args")
        if line_args is None:
            line_args = kwargs.get("contour_args")
        if line_args is None:
            line_args = [{}] * nroots
        elif isinstance(line_args, Mapping):
            line_args = [line_args] * nroots
        if len(line_args) < nroots:
            line_args += [{}] * (nroots - len(line_args))
        colors = self._get_color_at_index(kwargs.get("colors"))

        def _get_list(tag):
            ret = kwargs.get(tag)
            if ret is None:
                return None
            if not isinstance(ret, (list, tuple)):
                return [ret] * nroots
            return ret

        lws = _get_list("lws")
        alphas = _get_list("alphas")
        ls = _get_list("ls")
        for i, args in enumerate(line_args):
            c = args.copy()
            line_args[i] = c
            if colors and i < len(colors) and colors[i]:
                c["color"] = colors[i]
            if ls and i < len(ls) and ls[i]:
                c["ls"] = ls[i]
            if alphas and i < len(alphas) and alphas[i] is not None:
                c["alpha"] = alphas[i]
            if lws and i < len(lws) and lws[i]:
                c["lw"] = lws[i]
        return line_args

    def _update_limits(self, res, xlims, ylims, do_resize=True):
        if res is None:
            return xlims, ylims
        if xlims is None and ylims is None:
            return res
        if not do_resize:
            return xlims, ylims
        return self._update_limit(res[0], xlims), self._update_limit(res[1], ylims)

    def _update_limit(self, bounds, curbounds):
        # merge two (min, max) ranges into their union
        if not bounds:
            return curbounds
        if curbounds is None or curbounds[0] is None:
            return bounds
        return min(curbounds[0], bounds[0]), max(curbounds[1], bounds[1])

    def add_bands(
        self, x, y, errors, color="gray", nbands=2, alphas=(0.25, 0.15, 0.1), lw=0.2, lw_center=None, linecolor="k", ax=None
    ):
        """Constraint band(s) of y +- n*errors as a function of x."""
        ax = self.get_axes(ax)
        if np.isscalar(y):
            y = np.ones(len(x)) * y
        for i in reversed(range(nbands)):
            ax.fill_between(x, y - (i + 1) * errors, y + (i + 1) * errors, color=color, alpha=alphas[i], lw=lw)
        if lw_center:
            ax.plot(x, y, color=linecolor or color, lw=lw_center)

    # -- limit bookkeeping ---------------------------------------------------

    def add_y_bands(self, y, sigma, color="gray", ax=None, alpha1=0.15, alpha2=0.1, **kwargs):
        """Horizontal 1/2-sigma shaded bands."""
        ax = self.get_axes(ax)
        if alpha2 > 0:
            ax.axhspan((y - sigma * 2), (y + sigma * 2), color=color, alpha=alpha2, **kwargs)
        if alpha1 > 0:
            ax.axhspan((y - sigma), (y + sigma), color=color, alpha=alpha1, **kwargs)

    def add_x_bands(self, x, sigma, color="gray", ax=None, alpha1=0.15, alpha2=0.1, **kwargs):
        """Vertical 1/2-sigma shaded bands."""
        ax = self.get_axes(ax)
        if alpha2 > 0:
            ax.axvspan((x - sigma * 2), (x + sigma * 2), color=color, alpha=alpha2, **kwargs)
        if alpha1 > 0:
            ax.axvspan((x - sigma), (x + sigma), color=color, alpha=alpha1, **kwargs)

    def add_param_markers(self, param_value_dict, *, color=None, ls=None, lw=None):
        """Mark parameter values across all subplots that plot them."""
        for ax in self.subplots.reshape(-1):
            par = getattr(ax, "getdist_params", None)
            if par is not None:
                for p, op in zip(self._par_name_list(par), [self.add_x_marker, self.add_y_marker]):
                    for paramval in [x for x in makeList(param_value_dict.get(p, None)) if x is not None]:
                        op(paramval, color=color, ls=ls, lw=lw, ax=ax)

    def add_y_marker(self, marker, color=None, ls=None, lw=None, ax=None, **kwargs):
        """Horizontal marker line(s) at y value(s)."""
        if color is None:
            color = self.settings.axis_marker_color
        if ls is None:
            ls = self.settings.axis_marker_ls
        if lw is None:
            lw = self.settings.axis_marker_lw
        for m in makeList(marker):
            self.get_axes(ax).axhline(m, ls=ls, color=color, lw=lw, **kwargs)

    def add_x_marker(self, marker, color=None, ls=None, lw=None, ax=None, **kwargs):
        """Vertical marker line(s) at x value(s)."""
        if color is None:
            color = self.settings.axis_marker_color
        if ls is None:
            ls = self.settings.axis_marker_ls
        if lw is None:
            lw = self.settings.axis_marker_lw
        for m in makeList(marker):
            self.get_axes(ax).axvline(m, ls=ls, color=color, lw=lw, **kwargs)

    def add_2d_mixture_projection(self, mixture, param1, param2, **kwargs):
        density = mixture.marginalizedMixture(params=[param1, param2]).density2D()
        return self.add_2d_density_contours(density, **kwargs)

    def add_2d_covariance(self, means, cov, xvals=None, yvals=None, def_width=4.0, samples_per_std=50.0, **kwargs):
        """Plot a 2D Gaussian-ellipse density from mean and covariance."""
        cov = np.asarray(cov)
        assert cov.shape[0] == 2 and cov.shape[1] == 2
        if xvals is None:
            err = np.sqrt(cov[0, 0])
            xvals = np.arange(means[0] - def_width * err, means[0] + def_width * err, err / samples_per_std)
        if yvals is None:
            err = np.sqrt(cov[1, 1])
            yvals = np.arange(means[1] - def_width * err, means[1] + def_width * err, err / samples_per_std)
        x, y = np.meshgrid(xvals - means[0], yvals - means[1])
        inv_cov = np.linalg.inv(cov)
        like = x**2 * inv_cov[0, 0] + 2 * x * y * inv_cov[0, 1] + y**2 * inv_cov[1, 1]
        density = Density2D(xvals, yvals, np.exp(-like / 2))
        density.contours = [0.32, 0.05]
        return self.add_2d_density_contours(density, **kwargs)

    def add_2d_shading(self, root, param1, param2, colormap=None, density=None, ax=None, **kwargs):
        """Add 2D density color shading (see reference ``plots.py:1219``)."""
        param1, param2 = self.get_param_array(root, [param1, param2])
        ax = self.get_axes(ax, pars=(param1, param2))
        density = density or self.sample_analyser.get_density_grid(
            root, param1, param2, conts=self.settings.num_plot_contours, likes=self.settings.shade_meanlikes
        )
        if density is None:
            return
        if colormap is None:
            colormap = self.settings.colormap
        scalar_map = cm.ScalarMappable(cmap=colormap)
        cols = scalar_map.to_rgba(np.linspace(0, 1, self.settings.num_shades))
        # fade the lowest shades towards white so plot edges stay clean
        n = min(self.settings.num_shades // 3, 20)
        white = np.array([1, 1, 1, 1])
        for i in range(n):
            cols[i + 1] = (white * (n - i) + np.array(cols[i + 1]) * i) / float(n)
        cols[0][3] = 0
        levels = np.linspace(0, 1, self.settings.num_shades) ** self.settings.shade_level_scale
        points = density.likes if self.settings.shade_meanlikes else density.P
        ax.contourf(density.x, density.y, points, self.settings.num_shades, colors=cols, levels=levels, **kwargs)
        ax.contour(density.x, density.y, points, self.settings.num_shades, colors=cols, levels=levels, **kwargs)

    def _density_for_contours(self, root, ax, param1, param2, param_pair, mask_function):
        """Resolve the Density2D to contour for a root (sample cache, an
        analytic mixture, or a masked recomputation)."""
        param1, param2 = self.get_param_array(root, param_pair or [param1, param2])
        ax.getdist_params = (param1, param2)
        if mask_function is not None:
            return self.samples_for_root(root).get2DDensityGridData(
                param1.name,
                param2.name,
                mask_function=mask_function,
                num_plot_contours=self.settings.num_plot_contours,
                meanlikes=self.settings.shade_meanlikes,
            )
        if isinstance(root, MixtureND):
            return root.marginalizedMixture(params=[param1, param2]).density2D()
        return self.sample_analyser.get_density_grid(
            root, param1, param2, conts=self.settings.num_plot_contours, likes=self.settings.shade_meanlikes
        )

    def _claim_contour_proxy(self, add_legend_proxy, plotno):
        """Slot index in contours_added this contour set should fill for the
        legend, or -1 when it should not register a proxy."""
        if add_legend_proxy:
            self.contours_added.append(None)
            return len(self.contours_added) - 1
        if None in self.contours_added and self.contours_added.index(None) == plotno:
            return plotno
        return -1

    @staticmethod
    def _non_style_kwargs(args):
        return {k: v for k, v in args.items() if k not in ("color", "ls", "lw")}

    def _filled_contour_colors(self, cols, contour_levels, plotno, of, **kwargs):
        if cols is not None:
            return cols
        color = kwargs.get("color") or self._get_color_at_index(
            self.settings.solid_colors, (of - plotno - 1) if of is not None else plotno
        )
        if isinstance(color, str) or self._is_color_like(color):
            return self._get_paler_colors(color, len(contour_levels))
        return color

    def _draw_filled_contours(self, ax, density, z, contour_levels, cols, alpha, proxy_ix, **kwargs):
        levels = sorted(np.append([density.P.max() + 1], contour_levels))
        passthrough = self._non_style_kwargs(kwargs)
        cs = ax.contourf(density.x, density.y, z, levels, colors=cols, alpha=alpha, **passthrough)
        # outline in the deepest fill color; also the legend proxy color
        fc = tuple(cs.to_rgba(cs.cvalues[-1], cs.alpha))
        if proxy_ix >= 0:
            self.contours_added[proxy_ix] = matplotlib.patches.Rectangle((0, 0), 1, 1, fc=fc)
        lw = self.settings.linewidth_contour if kwargs.get("lw") is None else kwargs["lw"]
        ax.contour(
            density.x,
            density.y,
            z,
            levels[:1],
            colors=(fc,),
            linewidths=self._scaled_linewidth(lw),
            linestyles=kwargs.get("ls"),
            alpha=alpha * self.settings.alpha_factor_contour_lines,
            **passthrough,
        )

    def _draw_line_contours(self, ax, density, z, contour_levels, alpha, proxy_ix, plotno, **kwargs):
        style = self._get_line_styles(plotno, **kwargs)
        plot_args = self._get_plot_args(plotno, **kwargs)
        plot_args["alpha"] = alpha
        cs = ax.contour(
            density.x,
            density.y,
            z,
            sorted(contour_levels),
            colors=[style["color"]],
            linestyles=[style["ls"]],
            linewidths=style["lw"],
            **self._non_style_kwargs(plot_args),
        )
        dashes = style.get("dashes")
        if dashes:
            if hasattr(cs, "collections"):
                for c in cs.collections:
                    c.set_dashes([(0, dashes)])
            else:
                cs.set_dashes([(0, dashes)] * len(cs.levels))
        if proxy_ix >= 0:
            line = matplotlib.lines.Line2D(
                [0, 1], [0, 1], ls=style["ls"], lw=style["lw"], color=style["color"], alpha=style.get("alpha")
            )
            if dashes:
                line.set_dashes(dashes)
            self.contours_added[proxy_ix] = line

    def add_2d_contours(
        self,
        root,
        param1=None,
        param2=None,
        plotno=0,
        of=None,
        cols=None,
        contour_levels=None,
        add_legend_proxy=True,
        param_pair=None,
        density=None,
        alpha=None,
        ax=None,
        mask_function: callable = None,
        **kwargs,
    ):
        """Add 2D contours (filled or line) for one root / density (see
        reference ``plots.py:1063-1217``). Returns density bounds."""
        ax = self.get_axes(ax)
        if density is None:
            density = self._density_for_contours(root, ax, param1, param2, param_pair, mask_function)
            if density is None:
                if add_legend_proxy:
                    self.contours_added.append(None)
                return None
        if alpha is None:
            alpha = self._get_alpha_2d(plotno, **kwargs)
        if contour_levels is None:
            if not hasattr(density, "contours"):
                wanted = self.sample_analyser.ini.ndarray("contours")
                if wanted is not None:
                    wanted = wanted[: self.settings.num_plot_contours]
                density.contours = density.getContourLevels(wanted)
            contour_levels = density.contours

        proxy_ix = self._claim_contour_proxy(add_legend_proxy, plotno)
        z = density.P if density.mask is None else np.ma.masked_where(density.mask, density.P)
        if kwargs.get("filled"):
            cols = self._filled_contour_colors(cols, contour_levels, plotno, of, **kwargs)
            self._draw_filled_contours(ax, density, z, contour_levels, cols, alpha, proxy_ix, **kwargs)
        else:
            self._draw_line_contours(ax, density, z, contour_levels, alpha, proxy_ix, plotno, **kwargs)
        return density.bounds()

    def _is_color_like(self, color):
        try:
            return matplotlib.colors.is_color_like(color)
        except Exception:
            return False

    def add_2d_density_contours(self, density, **kwargs):
        """Add contours from a provided Density2D."""
        return self.add_2d_contours(None, density=density, **kwargs)

    def _get_paler_colors(self, color_rgb, n_levels, pale_factor=None):
        color = matplotlib.colors.colorConverter.to_rgb(color_rgb)
        pale_factor = pale_factor or self.settings.solid_contour_palefactor
        cols = [color]
        for _ in range(1, n_levels):
            cols = [[c * (1 - pale_factor) + pale_factor for c in cols[0]]] + cols
        return cols

    def add_1d(self, root, param, plotno=0, normalized=None, ax=None, title_limit=None, **kwargs):
        """Add one marginalized 1D density line (see reference
        ``plots.py:982-1036``). Returns density bounds."""
        param = self._check_param(root, param)
        ax = self.get_axes(ax, pars=(param,))
        normalized = normalized if normalized is not None else self.settings.norm_1d_density
        if isinstance(root, MixtureND):
            density = root.density1D(param.name)
            if not normalized:
                density.normalize(by="max")
        else:
            density = self.sample_analyser.get_density(root, param, likes=self.settings.plot_meanlikes)
            if density is None:
                return None

        title_limit = title_limit if title_limit is not None else self.settings.title_limit
        if normalized:
            density.normalize()

        kwargs = self._get_line_styles(plotno, **kwargs)
        self.lines_added[plotno] = kwargs
        (lines,) = ax.plot(density.x, density.P, **kwargs)
        if kwargs.get("dashes"):
            lines.set_dashes(kwargs["dashes"])
        if self.settings.plot_meanlikes:
            kwargs["lw"] = self._scaled_linewidth(self.settings.linewidth_meanlikes)
            ax.plot(density.x, density.likes, **kwargs)
        if title_limit:
            if isinstance(root, MixtureND):
                raise ValueError("title_limit not currently supported for MixtureND")
            samples = self.sample_analyser.samples_for_root(root)
            if self.settings.title_limit_labels:
                caption = samples.getInlineLatex(param, limit=title_limit)
            else:
                _, texs = samples.getLatex([param], title_limit)
                caption = texs[0]
            if "---" not in caption:
                ax.set_title(
                    "$" + caption + "$",
                    fontsize=self._scaled_fontsize(self.settings.title_limit_fontsize, self.settings.axes_fontsize),
                )
        return density.bounds()

    def _get_param_bounds(self, roots, name):
        xmin, xmax = None, None
        for root in roots:
            xmin, xmax = self._check_param_ranges(root, name, xmin, xmax)
        return xmin, xmax

    # -- low-level plot elements --------------------------------------------

    def _check_param_ranges(self, root, name, xmin, xmax):
        d = self.param_bounds_for_root(root)
        low = d.getLower(name)
        if low is not None:
            xmin = max(xmin, low) if xmin is not None else low
        up = d.getUpper(name)
        if up is not None:
            xmax = min(xmax, up) if xmax is not None else up
        return xmin, xmax

    def param_bounds_for_root(self, root):
        """Hard prior bounds object for a root name (cached)."""
        if root not in self.param_bounds_sets:
            self.param_bounds_sets[root] = self.sample_analyser.bounds_for_root(root)
        return self.param_bounds_sets[root]

    def param_names_for_root(self, root):
        """ParamNames for a root name (cached per plotter)."""
        if root not in self.param_name_sets:
            self.param_name_sets[root] = self.sample_analyser.params_for_root(
                root, label_params=self.settings.param_names_for_labels
            )
        return self.param_name_sets[root]

    def _get_alpha_2d(self, plotno, **kwargs):
        args = self._get_plot_args(plotno, **kwargs)
        if kwargs.get("filled") and plotno > 0:
            default = self.settings.alpha_filled_add
        else:
            default = 1
        return args.get("alpha", default)

    # -- name/bounds resolution ---------------------------------------------

    def _get_linestyle(self, plotno, **kwargs):
        return self._get_line_styles(plotno, **kwargs)["ls"]

    @staticmethod
    def _get_color_at_index(colors, i=None):
        if isinstance(colors, str):
            colormap = getattr(cm, colors, None)
            if colormap is None:
                raise GetDistPlotError("Unknown matplotlib colormap %s" % colors)
        else:
            colormap = colors
        colors = getattr(colormap, "colors", None) or colormap
        if i is None:
            return colors
        if i >= len(colors):
            raise IndexError("Color index out of range %s" % i)
        return colors[i]

    def _get_color(self, plotno, **kwargs):
        return self._get_line_styles(plotno, **kwargs)["color"]

    def _get_line_styles(self, plotno, **kwargs):
        args = self._get_plot_args(plotno, **kwargs)
        if "ls" not in args:
            args["ls"] = self._get_default_ls(plotno)[0]
        if "dashes" not in args:
            dashes = self._get_dashes_for_ls(args["ls"])
            if dashes is not None:
                args["dashes"] = dashes
        if "color" not in args:
            args["color"] = self._get_default_ls(plotno)[1]
        if "lw" not in args:
            args["lw"] = self._scaled_linewidth(self.settings.linewidth)
        return args

    def _get_default_ls(self, plotno=0):
        try:
            res = self._get_color_at_index(self.settings.line_styles, plotno)
            if matplotlib.colors.is_color_like(res):
                return "-", res
            if isinstance(res, str):
                i = 0
                while i < len(res) and res[i] in ["-", ".", ":"]:
                    i += 1
                return res[:i], res[i:]
            elif isinstance(res, Sequence):
                return res[0], res[1]
            raise ValueError("Unknown format for color [%s]" % (res,))
        except IndexError:
            print("Error adding line " + str(plotno) + ": Add more default line style entries to settings.line_styles")
            raise

    def _get_dashes_for_ls(self, ls):
        return self.settings.line_dash_styles.get(ls)

    def _get_plot_args(self, plotno, **kwargs):
        if isinstance(self.settings.plot_args, Mapping):
            args = self.settings.plot_args
        elif isinstance(self.settings.plot_args, (list, tuple)):
            if len(self.settings.plot_args) > plotno:
                args = self.settings.plot_args[plotno] or {}
            else:
                args = {}
        elif not self.settings.plot_args:
            args = {}
        else:
            raise GetDistPlotError("plot_args must be list of dictionaries or dictionary: %s" % self.settings.plot_args)
        args.update(kwargs)
        return args

    def show_all_settings(self):
        """Print settings and library versions."""
        print("Python version:", sys.version)
        print("\nMatplotlib version:", matplotlib.__version__)
        print("\nGetDist Plot Settings:")
        print("getdist_tpu version:", getdist_tpu.__version__)
        for key, value in list(self.settings.__dict__.items()):
            print(key, ":", value)
        print("\nRC params:")
        for key, value in list(matplotlib.rcParams.items()):
            print(key, ":", value)

    # -- style helpers ------------------------------------------------------

    def new_plot(self, close_existing=None):
        """Reset for a new empty plot."""
        if close_existing is None:
            close_existing = self.auto_close
        self.extra_artists = []
        self.contours_added = []
        self.lines_added = dict()
        self.param_name_sets = dict()
        self.param_bounds_sets = dict()
        if close_existing and self.fig:
            plt.close(self.fig)
        self.fig = None
        self.subplots = None
        self.plot_col = 0
        self._last_ax = None

    def __del__(self):
        try:
            if self.auto_close and self.fig:
                plt.close(self.fig)
        except Exception:
            pass  # interpreter teardown: module globals may be gone

    @classmethod
    def get_subplot_plotter(
        cls, subplot_size=None, width_inch=None, scaling=True, rc_sizes=False, subplot_size_ratio=None, **kwargs
    ) -> "GetDistPlotter":
        plotter = cls(**kwargs)
        plotter.settings.set_with_subplot_size(subplot_size or 2, size_ratio=subplot_size_ratio)
        if scaling is not None:
            plotter.settings.scaling = scaling
        if width_inch:
            plotter.settings.fig_width_inch = width_inch
            if not kwargs.get("settings") and rc_sizes:
                plotter.settings.rc_sizes()
        return plotter

    @classmethod
    def get_single_plotter(cls, scaling=None, rc_sizes=False, **kwargs):
        ratio = kwargs.pop("ratio", None) or 3 / 4.0
        width_inch = kwargs.pop("width_inch", None) or 6
        plotter = cls(**kwargs)
        plotter.settings.set_with_subplot_size(width_inch, size_ratio=ratio)
        if scaling is not None:
            plotter.settings.scaling = scaling
        plotter.settings.fig_width_inch = width_inch
        if not kwargs.get("settings") and rc_sizes:
            plotter.settings.rc_sizes()
        plotter.make_figure(1)
        return plotter

    def set_default_settings(self):
        self.settings = copy.deepcopy(default_settings)

    _style_rc = {}



style_name = "default"


class StyleManager:
    """Registry mapping style names to plotter classes + rcParams.

    Switching styles snapshots the pre-style rcParams once and restores that
    snapshot before applying the next style, so styles never stack.
    """

    def __init__(self):
        self._plot_styles = {style_name: GetDistPlotter}
        self.active_style = style_name
        self._orig_rc = None

    def active_class(self, style=None):
        if style:
            self.set_active_style(style)
        return self._plot_styles[self.active_style]

    def _restore_rc_snapshot(self):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rcParams.clear()
            rcParams.update(self._orig_rc)

    def set_active_style(self, name=None):
        name = name or style_name
        previous = self.active_style
        if name == previous:
            return previous
        if name not in self._plot_styles:
            raise ValueError("Unknown style %s. Make sure you have imported the relevant style module." % name)
        if self._orig_rc is None:
            self._orig_rc = rcParams.copy()
        else:
            self._restore_rc_snapshot()
        self.active_style = name
        rcParams.update(self._plot_styles[name]._style_rc)
        if name == style_name:
            self._orig_rc = None
        return previous

    def add_plotter_style(self, name, cls, activate=False):
        self._plot_styles[name] = cls
        if activate:
            self.set_active_style(name)


_style_manager = StyleManager()


def set_active_style(name=None):
    """Set the active plotting style by name; returns the previous style."""
    return _style_manager.set_active_style(name)


def add_plotter_style(name, cls, activate=False):
    """Register a plotting style (plotter subclass), optionally activate."""
    _style_manager.add_plotter_style(name, cls, activate)
