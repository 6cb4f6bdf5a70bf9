"""Qt desktop GUI (requires PySide6; the streamlit app is the no-install
alternative).

Follows the reference GUI's architecture (``getdist/gui/mainwindow.py``):
the user configures roots/parameters/plot type, the app generates a
runnable python plot script (shown with syntax highlighting, exportable),
and executes that script for the preview — so every plot is reproducible
outside the GUI.
"""

import os
import sys


def run_gui(args=None):
    """Launch the Qt GUI; prints install guidance if PySide6 is missing."""
    try:
        from PySide6.QtWidgets import QApplication
    except ImportError:
        print(
            "The desktop GUI requires PySide6 (pip install PySide6).\n"
            "Alternatively run the web GUI: getdist-tpu-streamlit <chain_dir>"
        )
        return 1
    app = QApplication(sys.argv if args is None else args)
    window = MainWindow()
    window.show()
    return app.exec()


try:
    from PySide6.QtCore import Qt
    from PySide6.QtWidgets import (
        QComboBox,
        QFileDialog,
        QHBoxLayout,
        QLabel,
        QListWidget,
        QListWidgetItem,
        QMainWindow,
        QMessageBox,
        QPlainTextEdit,
        QPushButton,
        QSplitter,
        QTabWidget,
        QVBoxLayout,
        QWidget,
    )

    _HAVE_QT = True
except ImportError:  # pragma: no cover - environment without Qt
    _HAVE_QT = False
    QMainWindow = object


if _HAVE_QT:
    from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg

    from getdist_tpu.gui.plot_script import generate_plot_script
    from getdist_tpu.gui.SyntaxHighlight import PythonHighlighter

    class MainWindow(QMainWindow):
        """Main GUI window: directory browser, root/parameter selection,
        plot builder with script preview, stats text views."""

        def __init__(self):
            super().__init__()
            self.setWindowTitle("GetDist-TPU GUI")
            self.resize(1200, 800)
            self.chain_dir = None
            self.plotter = None

            central = QWidget()
            layout = QHBoxLayout(central)
            self.setCentralWidget(central)

            # left: controls
            controls = QWidget()
            controls_layout = QVBoxLayout(controls)
            open_btn = QPushButton("Open chain directory...")
            open_btn.clicked.connect(self.open_directory)
            controls_layout.addWidget(open_btn)
            controls_layout.addWidget(QLabel("Roots:"))
            self.root_list = QListWidget()
            self.root_list.setSelectionMode(QListWidget.ExtendedSelection)
            self.root_list.itemSelectionChanged.connect(self.update_params)
            controls_layout.addWidget(self.root_list)
            controls_layout.addWidget(QLabel("Parameters:"))
            self.param_list = QListWidget()
            self.param_list.setSelectionMode(QListWidget.ExtendedSelection)
            controls_layout.addWidget(self.param_list)
            controls_layout.addWidget(QLabel("Plot type:"))
            self.plot_type = QComboBox()
            self.plot_type.addItems(["triangle", "1d", "1d_grid", "2d_filled", "2d_line", "3d"])
            controls_layout.addWidget(self.plot_type)
            plot_btn = QPushButton("Make plot")
            plot_btn.clicked.connect(self.make_plot)
            controls_layout.addWidget(plot_btn)
            stats_btn = QPushButton("Marge stats")
            stats_btn.clicked.connect(lambda: self.show_stats("marge"))
            controls_layout.addWidget(stats_btn)
            conv_btn = QPushButton("Convergence")
            conv_btn.clicked.connect(lambda: self.show_stats("converge"))
            controls_layout.addWidget(conv_btn)
            export_btn = QPushButton("Export figure...")
            export_btn.clicked.connect(self.export_figure)
            controls_layout.addWidget(export_btn)
            layout.addWidget(controls, 1)

            # right: tabs (figure / script / stats)
            self.tabs = QTabWidget()
            self.canvas_holder = QWidget()
            self.canvas_layout = QVBoxLayout(self.canvas_holder)
            self.tabs.addTab(self.canvas_holder, "Plot")
            self.script_edit = QPlainTextEdit()
            self.script_edit.setReadOnly(True)
            PythonHighlighter(self.script_edit.document())
            self.tabs.addTab(self.script_edit, "Script")
            self.stats_view = QPlainTextEdit()
            self.stats_view.setReadOnly(True)
            self.tabs.addTab(self.stats_view, "Statistics")
            layout.addWidget(self.tabs, 3)

            self.current_fig = None
            self.canvas = None

        # -- actions -----------------------------------------------------
        def open_directory(self):
            directory = QFileDialog.getExistingDirectory(self, "Open chain directory")
            if not directory:
                return
            from getdist_tpu import plots
            from getdist_tpu.chain_grid import get_chain_root_files

            self.chain_dir = directory
            self.plotter = plots.get_subplot_plotter(chain_dir=directory, auto_close=True)
            self.root_list.clear()
            for root in get_chain_root_files(directory):
                QListWidgetItem(root, self.root_list)

        def selected_roots(self):
            return [item.text() for item in self.root_list.selectedItems()]

        def selected_params(self):
            return [item.text() for item in self.param_list.selectedItems()]

        def update_params(self):
            roots = self.selected_roots()
            self.param_list.clear()
            if roots and self.plotter:
                for name in self.plotter.param_names_for_root(roots[0]).list():
                    QListWidgetItem(name, self.param_list)

        def make_plot(self):
            roots = self.selected_roots()
            params = self.selected_params()
            if not roots or not params:
                QMessageBox.warning(self, "GetDist-TPU", "Select root(s) and parameter(s) first")
                return
            script = generate_plot_script(roots, params, self.plot_type.currentText(), chain_dir=self.chain_dir)
            self.script_edit.setPlainText(script)
            env = {}
            try:
                exec(compile(script, "<gui script>", "exec"), env)
            except Exception as e:
                QMessageBox.critical(self, "Plot failed", str(e))
                return
            self.current_fig = env["g"].fig
            if self.canvas is not None:
                self.canvas_layout.removeWidget(self.canvas)
                self.canvas.deleteLater()
            self.canvas = FigureCanvasQTAgg(self.current_fig)
            self.canvas_layout.addWidget(self.canvas)
            self.tabs.setCurrentIndex(0)

        def show_stats(self, which):
            roots = self.selected_roots()
            if not roots:
                return
            samples = self.plotter.samples_for_root(roots[0])
            if which == "marge":
                text = str(samples.getMargeStats())
            else:
                text = samples.getConvergeTests(samples.converge_test_limit)
            self.stats_view.setPlainText(text)
            self.tabs.setCurrentWidget(self.stats_view)

        def export_figure(self):
            if self.current_fig is None:
                return
            fname, _ = QFileDialog.getSaveFileName(self, "Export figure", "", "PDF (*.pdf);;PNG (*.png)")
            if fname:
                self.current_fig.savefig(fname, bbox_inches="tight")


if __name__ == "__main__":
    sys.exit(run_gui())
