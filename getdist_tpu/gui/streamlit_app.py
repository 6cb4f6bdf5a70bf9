"""Streamlit web GUI for browsing chains and making plots.

Web re-implementation of the reference GUI capabilities (reference
``getdist/gui/streamlit_app.py`` / ``mainwindow.py``): open chain
directories (with a recent-directories file), pick roots and parameters,
build 1D/2D/triangle/3D plots, view marginalized/likelihood/convergence/PCA
statistics and LaTeX parameter tables, edit analysis settings, and preview/
download the reproducible plot script behind every figure.

Run with: ``getdist-tpu-streamlit`` or
``streamlit run getdist_tpu/gui/streamlit_app.py -- [chain_dir]``.
"""

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import matplotlib

matplotlib.use("Agg")

from getdist_tpu.gui.plot_script import generate_plot_script

RECENT_FILE = os.path.join(os.path.expanduser("~"), ".getdist_tpu_recent_dirs")

ANALYSIS_SETTING_FIELDS = [
    ("ignore_rows", float, 0.0),
    ("smooth_scale_1D", float, -1.0),
    ("smooth_scale_2D", float, -1.0),
    ("boundary_correction_order", int, 1),
    ("mult_bias_correction_order", int, 1),
    ("fine_bins", int, 1024),
    ("fine_bins_2D", int, 256),
    ("max_corr_2D", float, 0.99),
    ("contours", str, "0.68 0.95 0.99"),
]


def load_recent_dirs():
    try:
        with open(RECENT_FILE, encoding="utf-8") as f:
            return [line.strip() for line in f if line.strip() and os.path.isdir(line.strip())]
    except OSError:
        return []


def save_recent_dirs(dirs):
    try:
        with open(RECENT_FILE, "w", encoding="utf-8") as f:
            f.write("\n".join(dirs[:10]))
    except OSError:
        pass


def main():
    import streamlit as st

    from getdist_tpu import plots

    st.set_page_config(page_title="GetDist-TPU GUI", layout="wide")
    st.title("GetDist-TPU sample analyser")

    state = st.session_state
    state.setdefault("chain_dir", None)
    state.setdefault("selected_roots", [])
    state.setdefault("analysis_settings", {})

    # ---------------- sidebar: directory + roots -------------------------
    with st.sidebar:
        st.header("Chains")
        recents = load_recent_dirs()
        args_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else None
        default_dir = state["chain_dir"] or args_dir or (recents[0] if recents else "")
        chain_dir = st.text_input("Chain directory or grid path", value=default_dir)
        if recents:
            chosen = st.selectbox("Recent directories", ["(keep current)"] + recents)
            if chosen != "(keep current)":
                chain_dir = chosen
        if st.button("Open directory", use_container_width=True) or (
            chain_dir and chain_dir != state["chain_dir"] and os.path.isdir(chain_dir)
        ):
            if os.path.isdir(chain_dir):
                state["chain_dir"] = chain_dir
                save_recent_dirs([chain_dir] + [d for d in recents if d != chain_dir])
            else:
                st.error("Directory not found: %s" % chain_dir)

        plotter = None
        roots = []
        if state["chain_dir"]:
            plotter = plots.get_subplot_plotter(
                chain_dir=state["chain_dir"],
                analysis_settings=state["analysis_settings"] or None,
                auto_close=True,
            )
            from getdist_tpu.chain_grid import get_chain_root_files, is_grid_object

            for location, dir_obj in zip(
                plotter.sample_analyser.chain_locations, plotter.sample_analyser.chain_dirs
            ):
                if is_grid_object(dir_obj):
                    roots.extend(sorted(getattr(dir_obj, "roots", {})))
                else:
                    roots.extend(get_chain_root_files(location))
        selected_roots = st.multiselect("Roots", roots, default=[r for r in state["selected_roots"] if r in roots])
        state["selected_roots"] = selected_roots

        st.header("Analysis settings")
        with st.expander("Edit analysis settings"):
            new_settings = {}
            for name, tp, default in ANALYSIS_SETTING_FIELDS:
                current = state["analysis_settings"].get(name, default)
                if tp is str:
                    value = st.text_input(name, value=str(current))
                elif tp is int:
                    value = st.number_input(name, value=int(current), step=1)
                else:
                    value = st.number_input(name, value=float(current), format="%.4f")
                if str(value) != str(default):
                    new_settings[name] = value
            if st.button("Apply settings"):
                state["analysis_settings"] = new_settings
                st.rerun()

    if not state["chain_dir"] or not selected_roots or plotter is None:
        st.info("Open a chain directory and select one or more roots to begin.")
        return

    params = plotter.param_names_for_root(selected_roots[0]).list()

    # ---------------- main area ------------------------------------------
    plot_tab, stats_tab = st.tabs(["Plots", "Statistics"])

    with plot_tab:
        col1, col2, col3 = st.columns(3)
        with col1:
            plot_type = st.selectbox(
                "Plot type", ["1d", "1d_grid", "2d_filled", "2d_line", "triangle", "3d"], index=4
            )
        with col2:
            x_params = st.multiselect("Parameters", params, default=params[: min(3, len(params))])
        with col3:
            color_param = st.selectbox("Color parameter (3d)", ["(none)"] + params)

        needed = {"1d": 1, "2d_filled": 2, "2d_line": 2, "3d": 2}.get(plot_type, 1)
        if len(x_params) < needed:
            st.warning(f"Select at least {needed} parameter(s) for {plot_type}.")
            return

        script = generate_plot_script(
            selected_roots,
            x_params,
            plot_type,
            chain_dir=state["chain_dir"],
            color_param=None if color_param == "(none)" else color_param,
            analysis_settings=state["analysis_settings"] or None,
        )
        if st.button("Make plot", type="primary"):
            env = {}
            exec(compile(script, "<gui script>", "exec"), env)  # noqa: S102 - the GUI's own generated script
            fig = env["g"].fig
            st.pyplot(fig)
            png = io.BytesIO()
            fig.savefig(png, format="png", dpi=150, bbox_inches="tight")
            pdf = io.BytesIO()
            fig.savefig(pdf, format="pdf", bbox_inches="tight")
            dcol1, dcol2 = st.columns(2)
            dcol1.download_button("Download PNG", png.getvalue(), "plot.png", "image/png")
            dcol2.download_button("Download PDF", pdf.getvalue(), "plot.pdf", "application/pdf")
        with st.expander("Plot script (reproducible)"):
            st.code(script, language="python")
            st.download_button("Download script", script, "plot_script.py", "text/x-python")

    with stats_tab:
        root = st.selectbox("Root", selected_roots)
        samples = plotter.samples_for_root(root)
        which = st.radio(
            "View", ["Marginalized stats", "Likelihood stats", "Convergence", "PCA", "LaTeX table"], horizontal=True
        )
        if which == "Marginalized stats":
            st.text(str(samples.getMargeStats()))
        elif which == "Likelihood stats":
            stats = samples.getLikeStats()
            st.text(str(stats) if stats else "No likelihood values in samples")
        elif which == "Convergence":
            st.text(samples.getConvergeTests(samples.converge_test_limit))
        elif which == "PCA":
            pca_params = st.multiselect("PCA parameters", params, default=params[:2], key="pca_params")
            if len(pca_params) >= 2:
                st.text(samples.PCA(pca_params))
        else:
            limit = st.selectbox("Limit", [1, 2, 3], index=1)
            table = samples.getTable(columns=1, limit=limit)
            st.code(table.tableTex(), language="latex")


if __name__ == "__main__":
    main()
