"""Qt syntax highlighter for the GUI's generated-script pane (reference
``gui/SyntaxHighlight.py``). Requires PySide6."""

from PySide6.QtCore import QRegularExpression
from PySide6.QtGui import QColor, QFont, QSyntaxHighlighter, QTextCharFormat

PYTHON_KEYWORDS = (
    "and as assert break class continue def del elif else except finally for "
    "from global if import in is lambda nonlocal not or pass raise return try "
    "while with yield True False None"
).split()


def _fmt(color, bold=False, italic=False):
    fmt = QTextCharFormat()
    fmt.setForeground(QColor(color))
    if bold:
        fmt.setFontWeight(QFont.Bold)
    if italic:
        fmt.setFontItalic(True)
    return fmt


class PythonHighlighter(QSyntaxHighlighter):
    """Lightweight regex-based python highlighting."""

    def __init__(self, document):
        super().__init__(document)
        self.rules = []
        keyword_fmt = _fmt("#0000a0", bold=True)
        for word in PYTHON_KEYWORDS:
            self.rules.append((QRegularExpression(rf"\b{word}\b"), keyword_fmt))
        self.rules.append((QRegularExpression(r"\bdef\s+(\w+)"), _fmt("#007070", bold=True)))
        self.rules.append((QRegularExpression(r"\b[0-9]+(\.[0-9]+)?\b"), _fmt("#905000")))
        self.rules.append((QRegularExpression(r"'[^']*'"), _fmt("#007000")))
        self.rules.append((QRegularExpression(r'"[^"]*"'), _fmt("#007000")))
        self.rules.append((QRegularExpression(r"#.*$"), _fmt("#808080", italic=True)))

    def highlightBlock(self, text):
        for pattern, fmt in self.rules:
            it = pattern.globalMatch(text)
            while it.hasNext():
                match = it.next()
                self.setFormat(match.capturedStart(), match.capturedLength(), fmt)
