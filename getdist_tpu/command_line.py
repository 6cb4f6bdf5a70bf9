"""Command-line batch analysis driver (the ``getdist-tpu`` console script).

Behavior-compatible with the reference CLI (``getdist/command_line.py``):
loads chains (glob multi-root support), removes burn-in, writes convergence
/ covmat / correlation / thinned outputs, runs PCA, computes all
marginalized statistics (``.margestats`` / ``.likestats``), and emits
runnable plot scripts (1D/2D/triangle/3D), optionally executing them.

Structured as a small pipeline object (:class:`_BatchRun`) whose stages
mirror the analysis order; every printed line and output file format is
regression-tested byte-identical to the reference CLI
(tests/test_command_line.py).
"""

import logging
import os
import subprocess
import sys

import getdist_tpu
from getdist_tpu import chains
from getdist_tpu.inifile import IniFile
from getdist_tpu.mcsamples import MCSamples

# ini keys the reference accepts but no longer acts on
_RETIRED_KEYS = frozenset(
    (
        "make_single_samples",
        "single_thin",
        "dump_ND_bins",
        "plot_meanlikes",
        "shade_meanlikes",
        "plot_data_dir",
        "force_twotail",
    )
)


def runScript(fname):
    subprocess.Popen(["python", fname])


class _BatchRun:
    """One CLI analysis invocation: holds the option state and the captured
    output lines; stages are methods, executed in order by :meth:`execute`."""

    def __init__(self, args, exit_on_error):
        self.args = args
        self.exit_on_error = exit_on_error
        self.lines = []
        self.samples = None
        self.ini = None

    # -- infrastructure -----------------------------------------------------

    def fail(self, message):
        if self.exit_on_error:
            print(message)
            sys.exit()
        raise ValueError(message)

    def say(self, *items):
        self.lines.append(" ".join(str(piece) for piece in items))
        print(*items)

    def select_params(self, namestring, num=None):
        """Expand an ini parameter list (supports ?/* globs); empty means
        every parameter. With ``num``, reject lists of the wrong length."""
        chosen = []
        if not namestring.strip():
            chosen = self.samples.paramNames.list()
        else:
            for token in namestring.split():
                if "?" in token or "*" in token:
                    chosen += self.samples.paramNames.getMatches(token, strings=True)
                elif self.samples.paramNames.parWithName(token):
                    chosen.append(token)
        if num is not None and len(chosen) != num:
            self.say("%iD plot has missing parameter or wrong number of parameters: %s" % (num, chosen))
            return None
        return chosen

    # -- stages --------------------------------------------------------------

    def resolve_inputs(self):
        """Sort out the ini-file / chain-root argument forms; returns False
        when this invocation fanned out over a glob (nothing more to do)."""
        args = self.args
        self.implicit_no_plots = False
        root = args.chain_root
        if args.ini_file is None and root is None:
            self.fail(
                'Must give either a .ini file of parameters or a chain file root name. Run "getdist -h" for help.'
            )
        if ".ini" not in args.ini_file and root is None:
            # a bare chain root: analyse with packaged defaults, no plots
            root = args.ini_file
            args.ini_file = getdist_tpu.default_getdist_settings
            self.implicit_no_plots = True
        if not os.path.isfile(args.ini_file):
            self.fail("Parameter file does not exist: " + args.ini_file)
        if root and root.endswith(".txt"):
            root = root[:-4]

        if root is not None and ("*" in root or "?" in root):
            import copy
            import glob

            for suffix in [".paramnames", "updated.yaml"]:
                for match in glob.glob(root + suffix):
                    sub_args = copy.copy(args)
                    sub_args.chain_root = match.replace(suffix, "")
                    getdist_script(sub_args)
            return False
        self.chain_root = root
        return True

    def read_settings(self):
        self.ini = ini = IniFile(self.args.ini_file)
        for key in set(ini.params.keys()).intersection(_RETIRED_KEYS):
            if ini.string(key) not in [0, "F"]:
                logging.warning("%s is no longer supported, value ignored" % key)

        self.in_root = self.chain_root if self.chain_root is not None else ini.params["file_root"]
        if not self.in_root:
            self.fail("Chain Root file name not given ")
        self.rootname = os.path.basename(self.in_root)

        # attribute <- (typed getter, ini key, default)
        option_table = {
            "no_plots": (ini.bool, "no_plots", self.implicit_no_plots),
            "plots_only": (ini.bool, "plots_only", False),
            "plot_ext": (ini.string, "plot_ext", "py"),
            "finish_run_command": (ini.string, "finish_run_command", ""),
            "thin_factor": (ini.int, "thin_factor", 0),
            "thin_cool": (ini.float, "thin_cool", 1.0),
            "cool_factor": (ini.float, "cool", 1.0),
        }
        for attr, (getter, key, default) in option_table.items():
            setattr(self, attr, getter(key, default))
        self.chain_exclude = ini.int_list("exclude_chain")
        self.no_tests = self.plots_only or ini.bool("no_tests", False)
        self.burn_fraction = (
            self.args.ignore_rows if self.args.ignore_rows is not None else ini.float("ignore_rows", 0.0)
        )

        if "do_minimal_1d_intervals" in ini.params:
            self.fail("do_minimal_1d_intervals no longer used; set credible_interval_threshold instead")

        pca_line = ini.string("PCA_params", "")
        self.pca_params = None  # resolved after load when 'all'
        self.pca_line = pca_line
        self.pca_num = None

    def build_samples(self):
        ini = self.ini
        self.samples = mc = MCSamples(
            self.in_root,
            ini=ini,
            files_are_chains=ini.bool("samples_are_chains", True),
            paramNamesFile=ini.string("parameter_names", ""),
        )
        if ini.bool("adjust_priors", False) or ini.bool("map_params", False):
            self.fail(
                "To adjust priors or define new parameters, use a separate python script; "
                "see the python getdist docs for examples"
            )

        out_dir = ini.string("out_dir", "./")
        if out_dir:
            os.path.isdir(out_dir) or os.mkdir(out_dir)
            self.say("producing files in directory ", out_dir)
        mc.out_dir = out_dir

        override_root = ini.string("out_root", "")
        if override_root:
            self.rootname = override_root
            self.say("producing files with root ", override_root)
        mc.rootname = self.rootname
        self.rootdirname = os.path.join(out_dir, self.rootname)
        mc.rootdirname = self.rootdirname

        if self.pca_line.lower() == "all":
            self.pca_params = mc.paramNames.list()
        else:
            self.pca_params = self.pca_line.split()
        self.pca_num = ini.int("PCA_num", len(self.pca_params))
        if self.pca_num != 0:
            if self.pca_num < 2:
                self.fail("Can only do PCA for 2 or more parameters")
            self.pca_func = ini.string("PCA_func", "") or ["N"] * self.pca_num
            self.pca_norm_param = ini.string("PCA_normparam", "") or None

        index_filters = dict(
            first_chain=ini.int("first_chain", 0),
            last_chain=ini.int("chain_num", -1),
            chain_exclude=self.chain_exclude,
        )
        chain_files = chains.chainFiles(self.in_root, separator="_", **index_filters) or chains.chainFiles(
            self.in_root, separator=".", **index_filters
        )

        mc.loadChains(self.in_root, chain_files)
        mc.removeBurnFraction(self.burn_fraction)
        if chains.print_load_details:
            if self.burn_fraction:
                self.say("Removed %s as burn in" % self.burn_fraction)
            else:
                self.say("Removed no burn in")
        mc.deleteFixedParams()
        mc.makeSingle()

        if self.cool_factor != 1:
            self.say("Cooling chains by ", self.cool_factor)
            mc.cool(self.cool_factor)
        mc.updateBaseStatistics()

    def diagnostics(self):
        mc = self.samples
        if not self.no_tests:
            mc.getConvergeTests(mc.converge_test_limit, writeDataToFile=True, feedback=True)
        mc.writeCovMatrix()
        mc.writeCorrelationMatrix()
        if self.thin_factor > 1:
            thin_ix = mc.thin_indices(self.thin_factor)
            mc.writeThinData(self.rootdirname + "_thin.txt", thin_ix, self.thin_cool)
        self.say(mc.getNumSampleSummaryText().strip())
        if mc.likeStats:
            self.say(mc.likeStats.likeSummary().strip())
        if self.pca_num > 0 and not self.plots_only:
            mc.PCA(self.pca_params, self.pca_func, self.pca_norm_param, writeDataToFile=True)
        mc._setDensitiesandMarge1D()

    def plot_scripts(self):
        if self.no_plots:
            return
        mc = self.samples
        ini = self.ini

        requested_1d = []
        text = ini.string("plot_params", "")
        if text not in ["", "0"]:
            requested_1d = self.select_params(text)

        against_param = ini.string("plot_2D_param", "").strip()
        if not against_param or against_param == "0":
            against_param = None

        custom_pairs = []
        if not against_param:
            wanted = ini.int("plot_2D_num", 0)
            for index in range(1, wanted + 1):
                pair = self.select_params(ini.string("plot" + str(index)), 2)
                if pair is not None:
                    custom_pairs.append(pair)

        tri_params = []
        want_triangle = ini.bool("triangle_plot", False)
        if want_triangle:
            tri_params = self.select_params(ini.string("triangle_params", ""))
            want_triangle = len(tri_params) > 1

        scatter_triples = []
        n_scatter = ini.int("num_3D_plots", 0)
        for index in range(1, n_scatter + 1):
            triple = self.select_params(ini.string("3D_plot" + str(index)), 3)
            if triple is not None:
                scatter_triples.append(triple)
            else:
                n_scatter -= 1

        make_now = ini.bool("make_plots", False) or self.args.make_plots

        def emit(suffix, writer, *writer_args):
            fname = self.rootdirname + suffix + "." + self.plot_ext
            writer(fname, *writer_args)
            if make_now:
                runScript(fname)

        emit("", mc._writeScriptPlots1D, requested_1d)

        if against_param == "corr":
            self.say("...doing 2D plots for most correlated variables")
            custom_pairs = mc.getCorrelatedVariable2DPlots()
            against_param = None
        elif against_param:
            mc.paramNames.parWithName(against_param, error=True)

        if custom_pairs or against_param:
            self.say("...producing 2D plots")
            emit("_2D", mc._writeScriptPlots2D, against_param, custom_pairs)

        if want_triangle:
            self.say("...producing triangle plot")
            emit("_tri", mc._writeScriptPlotsTri, tri_params)

        if n_scatter:
            self.say("...producing ", n_scatter, "2D colored scatter plots")
            emit("_3D", mc._writeScriptPlots3D, scatter_triples)

    def stats_outputs(self):
        mc = self.samples
        if not self.plots_only:
            mc.getMargeStats().saveAsText(self.rootdirname + ".margestats")
            if mc.loglikes is not None:
                mc.getLikeStats().saveAsText(self.rootdirname + ".likestats")
        if self.finish_run_command:
            os.system(self.finish_run_command.replace("%ROOTNAME%", self.rootname))

    def execute(self):
        if not self.resolve_inputs():
            return None
        self.read_settings()
        self.build_samples()
        self.diagnostics()
        self.plot_scripts()
        self.stats_outputs()
        return "\n".join(self.lines)


def getdist_script(args, exit_on_error=True):
    """Run the batch analysis described by args (ini_file, chain_root,
    ignore_rows, make_plots); returns the printed output text."""
    return _BatchRun(args, exit_on_error).execute()


def make_param_file(file_name, feedback=True):
    """Write a template distparams .ini with the analysis defaults inlined."""
    with open(getdist_tpu.distparam_template, encoding="utf-8-sig") as f:
        template = f.read()
    with open(getdist_tpu.default_getdist_settings, encoding="utf-8-sig") as f:
        defaults = f.read()
    with open(file_name, "w", encoding="utf-8") as f:
        f.write(template.replace("%%%ANALYSIS_DEFAULTS%%%", defaults))
    if feedback:
        print("Template .ini file written to " + file_name)


# (name, argparse options) for the console-script parser, in -h order
_CLI_ARGS = (
    ("ini_file", dict(nargs="?", help=".ini file with analysis settings (optional, if omitted uses defaults)")),
    (
        "chain_root",
        dict(
            nargs="?",
            help="Root name of chain to analyse (e.g. chains/test), required unless file_root specified in ini_file",
        ),
    ),
    (
        "--ignore_rows",
        dict(
            type=float,
            help="set initial fraction of chains to cut as burn in (fraction of total rows"
            ", or >1 number of rows); overrides any value in ini_file if set",
        ),
    ),
    (
        "--make_param_file",
        dict(help="Produce a sample distparams.ini file that you can edit and use when running"),
    ),
    ("--make_plots", dict(action="store_true", help="Make PDFs from any requested plot script files")),
)


def getdist_command(args=None):
    """Entry point for the ``getdist-tpu`` console script."""
    import argparse

    parser = argparse.ArgumentParser(description="GetDist-TPU sample analyser")
    for name, options in _CLI_ARGS:
        parser.add_argument(name, **options)
    parser.add_argument("-V", "--version", action="version", version="%(prog)s " + getdist_tpu.__version__)
    args = parser.parse_args(args)
    if args.make_param_file:
        make_param_file(args.make_param_file)
        return None
    return getdist_script(args)


def getdist_gui():
    """Entry point launching the Qt desktop GUI (reference command_line.py:357-360)."""
    from getdist_tpu.gui.mainwindow import run_gui

    run_gui()


def getdist_streamlit():
    """Entry point launching the streamlit web GUI."""
    import importlib.util

    from getdist_tpu import gui

    if importlib.util.find_spec("streamlit") is None:
        print("Please pip install streamlit first")
        return
    app = os.path.dirname(gui.__file__) + os.sep + "streamlit_app.py"
    subprocess.Popen(["streamlit", "run", app, "--", *sys.argv[1:]], env=os.environ)
