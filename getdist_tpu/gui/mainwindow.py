"""Qt desktop GUI (requires PySide6; the streamlit app is the no-install
alternative).

Follows the reference GUI's architecture (``getdist/gui/mainwindow.py``):
the user configures roots/parameters/plot type, the app generates a
runnable python plot script (shown with syntax highlighting, exportable),
and executes that script for the preview — so every plot is reproducible
outside the GUI. Capabilities mirrored from the reference: directory and
grid browsing with recent-directory memory (``mainwindow.py:406-674``),
ordered root selection with move-up/down, stats dialog windows for
marge/like/converge/PCA/LaTeX tables (``:827-941``), an analysis-settings
editor over the full defaults schema (``:950-1130``), plot-option toggles,
a script preview pane built on :mod:`getdist_tpu.gui.plot_script`
(``:1637-1760``), and QSettings window/directory persistence (``:691-728``).

All state logic lives in :mod:`getdist_tpu.gui.app_logic` (GuiSession);
this module is Qt rendering only.
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
    from PySide6.QtCore import QSettings, Qt
    from PySide6.QtWidgets import (
        QCheckBox,
        QComboBox,
        QDialog,
        QDialogButtonBox,
        QDoubleSpinBox,
        QFileDialog,
        QFormLayout,
        QHBoxLayout,
        QLabel,
        QLineEdit,
        QListWidget,
        QListWidgetItem,
        QMainWindow,
        QMessageBox,
        QPlainTextEdit,
        QPushButton,
        QSpinBox,
        QSplitter,
        QTabWidget,
        QVBoxLayout,
        QWidget,
    )

    _HAVE_QT = True
except ImportError:  # pragma: no cover - environment without Qt
    _HAVE_QT = False
    QMainWindow = object
    QDialog = object


if _HAVE_QT:
    from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg

    from getdist_tpu.gui.app_logic import PLOT_TYPES, GuiSession, PlotSpec, analysis_settings_schema
    from getdist_tpu.gui.SyntaxHighlight import PythonHighlighter

    class TextDialog(QDialog):
        """Monospace text viewer window used by every stats action."""

        def __init__(self, parent, title, text, latex=False):
            super().__init__(parent)
            self.setWindowTitle(title)
            self.resize(700, 500)
            layout = QVBoxLayout(self)
            view = QPlainTextEdit()
            view.setReadOnly(True)
            view.setPlainText(text)
            if latex:
                PythonHighlighter(view.document())
            layout.addWidget(view)
            buttons = QDialogButtonBox(QDialogButtonBox.Close)
            buttons.rejected.connect(self.reject)
            buttons.clicked.connect(self.accept)
            layout.addWidget(buttons)

    class SettingsDialog(QDialog):
        """Schema-driven settings editor used for BOTH the analysis settings
        (role of reference mainwindow.py:950-1050) and the plot-style
        settings (``:993-1058``): pass the schema and the current override
        dict."""

        def __init__(self, parent, current, schema=None, title="Analysis settings"):
            super().__init__(parent)
            self.setWindowTitle(title)
            self.resize(480, 640)
            outer = QVBoxLayout(self)
            form_host = QWidget()
            form = QFormLayout(form_host)
            self._editors = {}
            self._schema = schema if schema is not None else analysis_settings_schema()
            for fieldspec in self._schema:
                value = current.get(fieldspec.name, fieldspec.default)
                if fieldspec.type is bool:
                    editor = QCheckBox()
                    editor.setChecked(bool(value))
                elif fieldspec.type is int:
                    editor = QSpinBox()
                    editor.setRange(-(10**9), 10**9)
                    editor.setValue(int(value))
                elif fieldspec.type is float:
                    editor = QDoubleSpinBox()
                    editor.setRange(-1e30, 1e30)
                    editor.setDecimals(6)
                    editor.setValue(float(value))
                else:
                    editor = QLineEdit(str(value))
                if fieldspec.help:
                    editor.setToolTip(fieldspec.help)
                form.addRow(fieldspec.name, editor)
                self._editors[fieldspec.name] = (editor, fieldspec)
            from PySide6.QtWidgets import QScrollArea

            scroll = QScrollArea()
            scroll.setWidget(form_host)
            scroll.setWidgetResizable(True)
            outer.addWidget(scroll)
            buttons = QDialogButtonBox(QDialogButtonBox.Ok | QDialogButtonBox.Cancel | QDialogButtonBox.Reset)
            buttons.accepted.connect(self.accept)
            buttons.rejected.connect(self.reject)
            buttons.button(QDialogButtonBox.Reset).clicked.connect(self._reset)
            outer.addWidget(buttons)

        def _reset(self):
            for editor, fieldspec in self._editors.values():
                if fieldspec.type is bool:
                    editor.setChecked(bool(fieldspec.default))
                elif fieldspec.type in (int, float):
                    editor.setValue(fieldspec.default)
                else:
                    editor.setText(str(fieldspec.default))

        def overrides(self):
            """Settings differing from the packaged defaults."""
            out = {}
            for name, (editor, fieldspec) in self._editors.items():
                if fieldspec.type is bool:
                    value = editor.isChecked()
                elif fieldspec.type in (int, float):
                    value = editor.value()
                else:
                    value = editor.text()
                if value != fieldspec.default:
                    out[name] = value
            return out

    class MainWindow(QMainWindow):
        """Main GUI window: directory/grid browser, ordered root selection,
        plot builder with script preview, stats dialogs, settings editor."""

        def __init__(self):
            super().__init__()
            self.setWindowTitle("GetDist-TPU GUI")
            self.session = GuiSession()
            self.settings = QSettings("getdist_tpu", "gui")
            geometry = self.settings.value("geometry")
            if geometry is not None:
                self.restoreGeometry(geometry)
            else:
                self.resize(1200, 800)

            self._build_menus()
            self._build_body()
            self.current_fig = None
            self.canvas = None
            last_dir = self.settings.value("last_dir")
            if last_dir and os.path.isdir(str(last_dir)):
                self._open_path(str(last_dir))

        # -- construction ---------------------------------------------------

        def _build_menus(self):
            bar = self.menuBar()
            file_menu = bar.addMenu("&File")
            file_menu.addAction("Open chain directory...", self.open_directory)
            self.recent_menu = file_menu.addMenu("Recent directories")
            self._fill_recent_menu()
            file_menu.addAction("Re-load files", self.reload_files)
            file_menu.addSeparator()
            file_menu.addAction("Export figure...", self.export_figure)
            file_menu.addAction("Export script...", self.export_script)
            file_menu.addSeparator()
            file_menu.addAction("Quit", self.close)

            data_menu = bar.addMenu("&Data")
            data_menu.addAction("Marge stats", lambda: self.show_stats("marge"))
            data_menu.addAction("Like stats", lambda: self.show_stats("like"))
            data_menu.addAction("Converge stats", lambda: self.show_stats("converge"))
            data_menu.addAction("Parameter PCA", lambda: self.show_stats("pca"))
            data_menu.addAction("Parameter table", lambda: self.show_stats("table"))

            options_menu = bar.addMenu("&Options")
            options_menu.addAction("Analysis settings...", self.edit_settings)
            options_menu.addAction("Plot settings...", self.edit_plot_settings)
            options_menu.addAction("Reset plot settings", lambda: self.session.reset_plot_settings())
            self.style_menu = options_menu.addMenu("Plot style module")
            for label, module in (
                ("default", None),
                ("planck", "getdist_tpu.styles.planck"),
                ("tab10", "getdist_tpu.styles.tab10"),
            ):
                self.style_menu.addAction(label, lambda m=module: self.set_style(m))

            help_menu = bar.addMenu("&Help")
            help_menu.addAction("About", self.show_about)

        def _build_body(self):
            central = QSplitter()
            self.setCentralWidget(central)

            controls = QWidget()
            controls_layout = QVBoxLayout(controls)
            self.grid_tag = QComboBox()
            self.grid_tag.currentTextChanged.connect(self._grid_tag_changed)
            self.grid_tag.hide()
            controls_layout.addWidget(self.grid_tag)
            controls_layout.addWidget(QLabel("Available roots:"))
            self.root_list = QListWidget()
            self.root_list.itemDoubleClicked.connect(lambda item: self.add_root(item.text()))
            controls_layout.addWidget(self.root_list)
            add_row = QHBoxLayout()
            add_btn = QPushButton("Add")
            add_btn.clicked.connect(lambda: [self.add_root(i.text()) for i in self.root_list.selectedItems()])
            add_row.addWidget(add_btn)
            controls_layout.addLayout(add_row)

            controls_layout.addWidget(QLabel("Selected roots (ordered):"))
            self.selected_list = QListWidget()
            controls_layout.addWidget(self.selected_list)
            order_row = QHBoxLayout()
            for label, action in (
                ("Up", lambda: self.move_selected(-1)),
                ("Down", lambda: self.move_selected(+1)),
                ("Remove", self.remove_selected),
            ):
                btn = QPushButton(label)
                btn.clicked.connect(action)
                order_row.addWidget(btn)
            controls_layout.addLayout(order_row)

            controls_layout.addWidget(QLabel("X parameters:"))
            self.param_list = QListWidget()
            self.param_list.setSelectionMode(QListWidget.ExtendedSelection)
            controls_layout.addWidget(self.param_list)
            controls_layout.addWidget(QLabel("Y parameters (rectangle):"))
            self.y_param_list = QListWidget()
            self.y_param_list.setSelectionMode(QListWidget.ExtendedSelection)
            controls_layout.addWidget(self.y_param_list)

            controls_layout.addWidget(QLabel("Plot type:"))
            self.plot_type = QComboBox()
            self.plot_type.addItems(list(PLOT_TYPES))
            controls_layout.addWidget(self.plot_type)
            toggles = QHBoxLayout()
            self.filled_box = QCheckBox("Filled")
            self.filled_box.setChecked(True)
            self.shaded_box = QCheckBox("Shaded")
            self.normalized_box = QCheckBox("Normalized")
            for box in (self.filled_box, self.shaded_box, self.normalized_box):
                toggles.addWidget(box)
            controls_layout.addLayout(toggles)
            plot_btn = QPushButton("Make plot")
            plot_btn.clicked.connect(self.make_plot)
            controls_layout.addWidget(plot_btn)
            central.addWidget(controls)

            self.tabs = QTabWidget()
            self.canvas_holder = QWidget()
            self.canvas_layout = QVBoxLayout(self.canvas_holder)
            self.tabs.addTab(self.canvas_holder, "Plot")
            # editable script pane: edits are re-executed for the preview
            # (the reference GUI's script-tab workflow, mainwindow.py:1637+)
            script_host = QWidget()
            script_layout = QVBoxLayout(script_host)
            self.script_edit = QPlainTextEdit()
            PythonHighlighter(self.script_edit.document())
            script_layout.addWidget(self.script_edit)
            run_script_btn = QPushButton("Run script for preview")
            run_script_btn.clicked.connect(self.run_edited_script)
            script_layout.addWidget(run_script_btn)
            self.tabs.addTab(script_host, "Script")
            central.addWidget(self.tabs)
            central.setSizes([320, 880])

        # -- persistence -----------------------------------------------------

        def closeEvent(self, event):  # noqa: N802 - Qt naming
            self.settings.setValue("geometry", self.saveGeometry())
            if self.session.chain_dir:
                self.settings.setValue("last_dir", self.session.chain_dir)
            super().closeEvent(event)

        def _fill_recent_menu(self):
            from getdist_tpu.gui.app_logic import load_recent_dirs

            self.recent_menu.clear()
            for directory in load_recent_dirs():
                self.recent_menu.addAction(directory, lambda d=directory: self._open_path(d))

        # -- directory handling ------------------------------------------------

        def open_directory(self):
            directory = QFileDialog.getExistingDirectory(self, "Open chain directory")
            if directory:
                self._open_path(directory)

        def _open_path(self, directory):
            try:
                self.session.open_directory(directory)
            except Exception as e:
                QMessageBox.critical(self, "Open failed", str(e))
                return
            self.settings.setValue("last_dir", directory)
            self._fill_recent_menu()
            if self.session.is_grid():
                self.grid_tag.show()
                self.grid_tag.clear()
                self.grid_tag.addItems(["(all)"] + self.session.param_tags())
            else:
                self.grid_tag.hide()
            self._refresh_roots(self.session.available_roots())

        def _grid_tag_changed(self, tag):
            if not self.session.is_grid() or not tag:
                return
            roots = self.session.available_roots() if tag == "(all)" else self.session.roots_for_tag(tag)
            self._refresh_roots(roots)

        def _refresh_roots(self, roots):
            self.root_list.clear()
            for root in roots:
                QListWidgetItem(root, self.root_list)
            self.selected_list.clear()
            self.session.root_order = []
            self.param_list.clear()
            self.y_param_list.clear()

        def reload_files(self):
            self.session.reload_files()
            self.update_params()

        # -- root selection ----------------------------------------------------

        def add_root(self, root):
            self.session.add_root(root)
            self._sync_selected()
            self.update_params()

        def remove_selected(self):
            for item in self.selected_list.selectedItems():
                self.session.remove_root(item.text())
            self._sync_selected()
            self.update_params()

        def move_selected(self, delta):
            items = self.selected_list.selectedItems()
            if items:
                self.session.move_root(items[0].text(), delta)
                self._sync_selected()

        def _sync_selected(self):
            self.selected_list.clear()
            for root in self.session.root_order:
                QListWidgetItem(root, self.selected_list)

        def update_params(self):
            self.param_list.clear()
            self.y_param_list.clear()
            if self.session.root_order:
                for name in self.session.param_list():
                    QListWidgetItem(name, self.param_list)
                    QListWidgetItem(name, self.y_param_list)

        def selected_params(self, which=None):
            host = self.y_param_list if which == "y" else self.param_list
            return [item.text() for item in host.selectedItems()]

        # -- plotting --------------------------------------------------------------

        def _current_spec(self):
            return PlotSpec(
                plot_type=self.plot_type.currentText(),
                x_params=self.selected_params(),
                y_params=self.selected_params("y"),
                filled=self.filled_box.isChecked(),
                shaded=self.shaded_box.isChecked(),
                normalized=self.normalized_box.isChecked(),
            )

        def make_plot(self):
            if not self.session.root_order:
                QMessageBox.warning(self, "GetDist-TPU", "Add root(s) first")
                return
            spec = self._current_spec()
            issues = spec.problems()
            if issues:
                QMessageBox.warning(self, "GetDist-TPU", "; ".join(issues))
                return
            try:
                fig, script = self.session.make_figure(spec)
            except Exception as e:
                QMessageBox.critical(self, "Plot failed", str(e))
                return
            self.script_edit.setPlainText(script)
            self._show_figure(fig)

        def _show_figure(self, fig):
            self.current_fig = fig
            if self.canvas is not None:
                self.canvas_layout.removeWidget(self.canvas)
                self.canvas.deleteLater()
            self.canvas = FigureCanvasQTAgg(self.current_fig)
            self.canvas_layout.addWidget(self.canvas)
            self.tabs.setCurrentIndex(0)

        # -- stats dialogs ------------------------------------------------------------

        def show_stats(self, which):
            if not self.session.root_order:
                QMessageBox.warning(self, "GetDist-TPU", "Add root(s) first")
                return
            root = self.session.root_order[0]
            try:
                if which == "marge":
                    TextDialog(self, f"Marge stats: {root}", self.session.marge_stats(root)).exec()
                elif which == "like":
                    TextDialog(self, f"Like stats: {root}", self.session.like_stats(root)).exec()
                elif which == "converge":
                    TextDialog(self, f"Convergence: {root}", self.session.converge_stats(root)).exec()
                elif which == "pca":
                    params = self.selected_params() or self.session.param_list()[:2]
                    if len(params) < 2:
                        QMessageBox.warning(self, "GetDist-TPU", "Select two or more parameters for PCA")
                        return
                    TextDialog(self, f"PCA: {root}", self.session.pca_report(root, params)).exec()
                elif which == "table":
                    params = self.selected_params() or None
                    TextDialog(
                        self, f"LaTeX table: {root}", self.session.latex_table(root, params), latex=True
                    ).exec()
            except Exception as e:
                QMessageBox.critical(self, "Statistics failed", str(e))

        # -- options --------------------------------------------------------------------

        def edit_settings(self):
            dialog = SettingsDialog(self, self.session.analysis_settings)
            if dialog.exec() == QDialog.Accepted:
                from getdist_tpu.gui.app_logic import update_script_analysis_settings

                self.session.apply_analysis_settings(dialog.overrides())
                self.update_params()
                # keep the script pane in sync (reference settingsChanged)
                text = self.script_edit.toPlainText()
                if text:
                    self.script_edit.setPlainText(
                        update_script_analysis_settings(text, self.session.analysis_settings)
                    )
                if self.current_fig is not None:
                    self.make_plot()

        def edit_plot_settings(self):
            """Plot-style settings editor over the full GetDistPlotSettings
            schema; overrides update the session, the script pane, and the
            live preview (role of reference mainwindow.py:993-1090)."""
            from getdist_tpu.gui.app_logic import (
                parse_plot_setting,
                plot_settings_schema,
                update_script_plot_settings,
            )

            schema = plot_settings_schema()
            current = {k: str(v) for k, v in self.session.custom_plot_settings.items()}
            dialog = SettingsDialog(self, current, schema=schema, title="Plot settings")
            if dialog.exec() != QDialog.Accepted:
                return
            overrides = {}
            by_name = {f.name: f for f in schema}
            try:
                for key, raw in dialog.overrides().items():
                    overrides[key] = parse_plot_setting(by_name[key], str(raw))
            except Exception as e:
                QMessageBox.critical(self, "Plot settings", str(e))
                return
            self.session.apply_plot_settings(overrides)
            text = self.script_edit.toPlainText()
            if text:
                self.script_edit.setPlainText(update_script_plot_settings(text, overrides))
            if self.current_fig is not None:
                self.run_edited_script() if text else self.make_plot()

        def run_edited_script(self):
            """Execute the (possibly edited) script pane text for the
            preview — edits are honored, not regenerated away."""
            text = self.script_edit.toPlainText()
            if not text:
                return
            try:
                fig = self.session.run_script(text)
            except Exception as e:
                QMessageBox.critical(self, "Script failed", str(e))
                return
            self._show_figure(fig)

        def set_style(self, module):
            self.session.set_plot_module(module)

        def show_about(self):
            import getdist_tpu

            QMessageBox.about(
                self,
                "GetDist-TPU",
                f"GetDist-TPU {getdist_tpu.__version__}\nTPU-native MCMC sample analysis.",
            )

        # -- export ------------------------------------------------------------------------

        def export_figure(self):
            if self.current_fig is None:
                return
            fname, _ = QFileDialog.getSaveFileName(self, "Export figure", "", "PDF (*.pdf);;PNG (*.png)")
            if fname:
                self.current_fig.savefig(fname, bbox_inches="tight")

        def export_script(self):
            text = self.script_edit.toPlainText()
            if not text:
                return
            fname, _ = QFileDialog.getSaveFileName(self, "Export script", "", "Python (*.py)")
            if fname:
                with open(fname, "w", encoding="utf-8") as handle:
                    handle.write(text)


if __name__ == "__main__":
    sys.exit(run_gui())
