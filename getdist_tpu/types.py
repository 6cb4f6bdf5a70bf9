"""Result types and LaTeX table generation (host-side).

Behavior-compatible with the reference ``getdist/types.py``: the
Decimal-exact significant-figure engine, ±limit merging
(``x^{+a}_{-b}`` vs ``x \\pm a``), chi-squared special cases, one-tail
``<``/``>`` forms, σ-shift annotations, three table formatters, the
multi-column ResultTable with latex→PNG rendering, and the parsers/writers
for ``.minimum``/``.bestfit``, ``.margestats``, ``.likestats`` and
``.converge`` files. Output strings are regression-tested to the character
against the reference.

Layout of this module: file-format parsers first (BestFit, ParamLimit,
MargeStats, LikeStats, ConvergeStats), then the significant-figure engine,
then the latex table machinery.
"""

import decimal
import os
import tempfile
from io import BytesIO
from types import MappingProxyType

import numpy as np

from getdist_tpu.paramnames import ParamInfo, ParamList, makeList

empty_dict = MappingProxyType({})

# |exponent| above which scientific notation kicks in
_sci_tolerance = 4


class TextFile:
    def __init__(self, lines=None):
        if isinstance(lines, str):
            lines = [lines]
        self.lines = lines or []

    def write(self, outfile):
        with open(outfile, "w", encoding="utf-8") as f:
            f.write("\n".join(self.lines))


def texEscapeText(string):
    return string.replace("_", "{\\textunderscore}")


def times_ten_power(exponent):
    return r"\cdot 10^{%d}" % exponent


class ParamResults(ParamList):
    """Base for sets of per-parameter results (self.names holds ParamInfo
    objects carrying result attributes)."""


# ---------------------------------------------------------------------------
# file-format parsers / writers
# ---------------------------------------------------------------------------


class LikelihoodChi2:
    name: str
    tag: str
    chisq: float


class BestFit(ParamResults):
    """Result of a likelihood minimization, parsed from CosmoMC/Cobaya
    .minimum or .bestfit text (incl. per-likelihood chi2 blocks)."""

    def __init__(self, fileName=None, setParamNameFile=None, want_fixed=False, max_posterior=True):
        """
        :param fileName: .minimum-format text file
        :param setParamNameFile: .paramnames file overriding labels
        :param want_fixed: include non-varying parameters
        :param max_posterior: True for .minimum, False for .bestfit
        """
        super().__init__()
        self.max_posterior = max_posterior
        if fileName is not None:
            self.loadFromFile(fileName, want_fixed=want_fixed)
        if setParamNameFile is not None:
            self.setLabelsFromParamNames(setParamNameFile)

    def getColumnLabels(self, **_kwargs):
        return ["Best fit"]

    def _parse_chisq_block(self, tail_lines):
        """The trailing per-likelihood chi-squared block of a .minimum file."""
        for entry in tail_lines:
            if not entry.strip():
                continue
            chisq, rest = [s.strip() for s in entry.split(None, 2)][1:]
            pieces = [s.strip() for s in rest.split(":", 1)]
            kind, label = pieces if len(pieces) > 1 else ("", pieces[0])
            record = LikelihoodChi2()
            if "=" in label:
                record.tag, record.name = (s.strip() for s in label.split("="))
            else:
                record.tag, record.name = None, label
            record.chisq = float(chisq)
            self.chiSquareds.append((kind, record))

    def loadFromFile(self, filename, want_fixed=False):
        body = self.fileList(filename)
        header = body[0].strip().split("=")
        if header[0].strip() == "weight":
            self.weight = float(header[1].strip())
            del body[0]
            header = body[0].strip().split("=")
        if header[0].strip() != "-log(Like)":
            raise Exception("Error in format of parameter (best fit) file")
        self.logLike = float(header[1].strip())
        self.chiSquareds = []
        in_fixed_block = False
        derived_flag = False
        blanks_seen = 0
        if len(body[1].strip()) > 0:
            del body[1]  # optional chi-sq header line variant
        for row in range(2, len(body)):
            entry = body[row]
            if not entry.strip():
                blanks_seen += 1
                in_fixed_block = not in_fixed_block
                derived_flag = True
                if blanks_seen == 3:
                    if row + 2 < len(body):
                        self._parse_chisq_block(body[row + 2 :])
                    break
                continue
            if in_fixed_block and not want_fixed:
                continue
            record = ParamInfo()
            record.isFixed = in_fixed_block
            record.isDerived = derived_flag
            record.number, record.best_fit, record.name, record.label = (s.strip() for s in entry.split(None, 3))
            record.number = int(record.number)
            record.best_fit = float(record.best_fit)
            self.names.append(record)

    def sortedChiSquareds(self):
        grouped = {}
        for kind, val in self.chiSquareds:
            grouped.setdefault(kind, []).append(val)
        return sorted(iter(grouped.items()))

    def chiSquareForKindName(self, kind, name):
        for akind, val in self.chiSquareds:
            if akind == kind and val.name == name:
                return val.chisq
        return None

    def texValues(self, formatter, p, **_kwargs):
        record = self.parWithName(p.name)
        if record is None:
            return None
        return [formatter.numberFormatter.formatNumber(record.best_fit)]

    def getParamDict(self, include_derived=True):
        out = {
            info.name: info.best_fit for info in self.names if include_derived or not info.isDerived
        }
        out["weight"] = 1
        out["loglike"] = self.logLike
        return out


class ParamLimit:
    """One marginalized limit: lower/upper bounds plus the tail type.

    :ivar lower: lower limit
    :ivar upper: upper limit
    :ivar twotail: True for a two-tail limit
    :ivar onetail_upper: True for a one-tail upper limit
    :ivar onetail_lower: True for a one-tail lower limit
    """

    def __init__(self, minmax, tag="two"):
        """
        :param minmax: [min, max] values (None if unbounded)
        :param tag: 'two' | '>' | '<' | 'none'
        """
        self.lower, self.upper = minmax[0], minmax[1]
        self.twotail = tag == "two"
        self.onetail_upper = tag == ">"
        self.onetail_lower = tag == "<"

    def limitTag(self):
        """Short tag: 'two', '>', '<' or 'none'."""
        for flag, tag in ((self.twotail, "two"), (self.onetail_upper, ">"), (self.onetail_lower, "<")):
            if flag:
                return tag
        return "none"

    def limitType(self):
        """Human-readable limit type description."""
        for flag, kind in (
            (self.twotail, "two tail"),
            (self.onetail_upper, "one tail upper limit"),
            (self.onetail_lower, "one tail lower limit"),
        ):
            if flag:
                return kind
        return "none"

    def __str__(self):
        return f"{self.lower:g} {self.upper:g} {self.limitTag()}"


class MargeStats(ParamResults):
    """Marginalized 1D statistics per parameter (mean, err, limits list);
    round-trips the .margestats text format."""

    def loadFromFile(self, filename):
        """Parse a .margestats file."""
        body = self.fileList(filename)
        self.limits = [float(s.strip()) for s in body[0].split(":")[1].split(";")]
        self.hasBestFit = False
        n_lims = len(self.limits)
        for entry in body[3:]:
            if not entry.strip():
                break
            record = ParamInfo()
            fields = [s.strip() for s in entry.split(None, n_lims * 3 + 3)]
            record.name = fields[0]
            if record.name.endswith("*"):
                record.isDerived = True
                record.name = record.name[:-1]
            record.mean = float(fields[1])
            record.err = float(fields[2])
            record.label = fields[-1]
            record.limits = [
                ParamLimit([float(s) for s in fields[3 + i * 3 : 5 + i * 3]], fields[5 + i * 3])
                for i in range(n_lims)
            ]
            self.names.append(record)

    def headerLine(self, inc_limits=False):
        parForm = self.parFormat()
        cells = [parForm % "parameter" + "  ", "%-15s" % "mean", "%-15s" % "sddev"]
        for j, limit in enumerate(self.limits):
            if inc_limits:
                tag = "_%.0f%%" % (limit * 100)
                limtxt = "type"
            else:
                tag = str(j + 1)
                limtxt = "limit" + tag
            cells.append("%-15s" % ("lower" + tag))
            cells.append("%-15s" % ("upper" + tag))
            cells.append("%-7s" % limtxt)
        return "".join(cells), parForm

    def __str__(self):
        header, parForm = self.headerLine()
        pieces = ["Marginalized limits: %s\n\n" % "; ".join(str(c) for c in self.limits), header, "\n"]
        for j, par in enumerate(self.names):
            pieces.append(parForm % (self.name(j, True)))
            pieces.append(f"{par.mean:15.7E}{par.err:15.7E}")
            for lim in par.limits:
                pieces.append("%15.7E%15.7E  %-5s" % (lim.lower, lim.upper, lim.limitTag()))
            pieces.append("   %s\n" % par.label)
        return "".join(pieces)

    def saveAsText(self, filename):
        """Write the .margestats text format."""
        with open(filename, "w", encoding="utf-8") as f:
            f.write(str(self))

    def addBestFit(self, bf):
        self.hasBestFit = True
        self.logLike = bf.logLike
        # drop parameters absent from the best fit
        self.names = [x for x in self.names if bf.parWithName(x.name) is not None]
        for par in self.names:
            match = bf.parWithName(par.name)
            par.best_fit = match.best_fit
            par.isDerived = match.isDerived

    def limitText(self, limit):
        txt = str(round(self.limits[limit - 1] * 100.0))
        if txt.endswith(".0"):
            txt = txt.split(".")[0]
        return txt

    def getColumnLabels(self, limit=2):
        labels = ["Best fit"] if self.hasBestFit else []
        return labels + [self.limitText(limit) + "\\% limits"]

    def _shift_annotation(self, param, refResults, shiftSigma_indep, shiftSigma_subset):
        """σ-shift annotation vs a reference result set, or ''."""
        refVal = refResults.parWithName(param.name)
        if refVal is None:
            return ""
        delta = param.mean - refVal.mean
        if not (shiftSigma_indep or shiftSigma_subset):
            return r"\quad(%+.1f \sigma)" % (delta / refVal.err)
        note = r"\quad("
        if shiftSigma_subset:
            subset_sigma = np.sqrt(abs(param.err**2 - refVal.err**2))
            note += "%+.1f \\sigma_s" % (delta / max(subset_sigma, refVal.err / 20))
        if shiftSigma_indep:
            indep_sigma = np.sqrt(param.err**2 + refVal.err**2)
            note += ", %+.1f \\sigma_i" % (delta / indep_sigma)
        return note + ")"

    def texValues(self, formatter, p, limit=2, refResults=None, shiftSigma_indep=False, shiftSigma_subset=False):
        """Tex snippet(s) for one parameter's constraint (reference
        ``types.py:824-897``): ±limit merging, chi2 special case, one-tail
        forms, sci-notation wrapping, σ-shift annotations, best fit."""
        param = self.parWithName(p if not isinstance(p, ParamInfo) else p.name)
        if param is None:
            return None
        nf = formatter.numberFormatter
        lim = param.limits[limit - 1]
        if param.name.startswith("chi2"):
            res = self._chi2_tex(nf, param, limit)
        elif lim.twotail:
            res = self._twotail_tex(nf, param, lim, limit)
        elif lim.onetail_upper or lim.onetail_lower:
            bound, mark = (lim.upper, "< ") if lim.onetail_upper else (lim.lower, "> ")
            body, exponent = nf.formatNumber(bound, 3, sci=True)
            res = mark + body + (times_ten_power(exponent) if exponent else "")
        else:
            res = formatter.noConstraint
        if refResults is not None and res != formatter.noConstraint:
            res += self._shift_annotation(param, refResults, shiftSigma_indep, shiftSigma_subset)
        if not self.hasBestFit:
            return [res]
        rangew = (lim.upper - lim.lower) / 10
        bestfit, _, _, exponent = nf.namesigFigs(param.best_fit, rangew, -rangew, sci=True)
        if exponent:
            bestfit += times_ten_power(exponent)
        return [res, bestfit]

    @staticmethod
    def _chi2_tex(nf, param, limit):
        # chi2 is very skewed for low dof: always mean ± sigma or dof
        res, sigma, _ = nf.namesigFigs(param.mean, param.err, param.err, wantSign=False, sci=False)
        if limit == 1:
            return res + r"\pm " + sigma
        return res + r"\,({\nu\rm{:}\,%.1f})" % (param.err**2 / 2)

    @staticmethod
    def _twotail_tex(nf, param, lim, limit):
        up_off, down_off = lim.upper - param.mean, lim.lower - param.mean
        if nf.plusMinusLimit(limit, up_off, down_off):
            res, plus_str, minus_str, exponent = nf.namesigFigs(param.mean, up_off, down_off, sci=True)
            res += "^{" + plus_str + "}_{" + minus_str + "}"
        else:
            res, plus_str, _, exponent = nf.namesigFigs(param.mean, param.err, param.err, wantSign=False, sci=True)
            res += r"\pm " + plus_str
        if exponent:
            res = r"\left(\,%s\,\right)" % res + times_ten_power(exponent)
        return res


class LikeStats(ParamResults):
    """Posterior statistics: best-fit sample, likelihood moments, and
    per-parameter extrema of the N-D confidence regions."""

    def loadFromFile(self, filename):
        """Parse the summary block of a .likestats file."""
        summary = {}
        for entry in self.fileList(filename):
            if not entry.strip():
                break
            key, value = (x.strip() for x in entry.split("="))
            summary[key] = float(value)
        self.logLike_sample = summary.get("Best fit sample -log(Like)")
        self.logMeanInvLike = summary.get("Ln(mean 1/like)")
        self.meanLogLike = summary.get("mean(-Ln(like))")
        self.logMeanLike = summary.get("-Ln(mean like)")
        self.complexity = summary.get("complexity")
        doubled = summary.get("2*Var(Ln(like))")
        self.varLogLike = 0.5 * doubled if doubled is not None else None

    def likeSummary(self):
        rows = ["Best fit sample -log(Like) = %f" % self.logLike_sample]
        if self.logMeanInvLike:
            rows.append("Ln(mean 1/like) = %f" % self.logMeanInvLike)
        rows += [
            "mean(-Ln(like)) = %f" % self.meanLogLike,
            "-Ln(mean like)  = %f" % self.logMeanLike,
            "2*Var(Ln(like)) = %f" % (self.varLogLike * 2.0),
        ]
        return "\n".join(rows) + "\n"

    def headerLine(self):
        return self.parFormat() % "parameter" + "  bestfit        lower1         upper1         lower2         upper2\n"

    def __str__(self):
        text = self.likeSummary()
        parForm = self.parFormat()
        if len(self.names):
            text += "\n"
            text += self.headerLine()
            for j, par in enumerate(self.names):
                if par.ND_limit_bot.size < 2:
                    raise Exception("Likestats output assumes at least two contour levels")
                text += parForm % (self.name(j, True))
                text += (
                    f"{par.bestfit_sample:15.7E}{par.ND_limit_bot[0]:15.7E}{par.ND_limit_top[0]:15.7E}"
                    f"{par.ND_limit_bot[1]:15.7E}{par.ND_limit_top[1]:15.7E}   {par.label}\n"
                )
        return text

    def saveAsText(self, filename):
        """Write the .likestats text format."""
        with open(filename, "w", encoding="utf-8") as f:
            f.write(str(self))


class ConvergeStats(ParamResults):
    """Parser for .converge files (R-1 eigenvalues, autocorrelation table)."""

    def loadFromFile(self, filename):
        try:
            body = self.fileList(filename)
            self.R_eigs = []
            for i, row in enumerate(body):
                if row.find("var(mean)") >= 0:
                    for entry in body[i + 1 :]:
                        if not entry.strip():
                            break
                        try:
                            self.R_eigs.append(entry.split()[1])
                        except Exception:
                            self.R_eigs.append("1e30")
                elif "Parameter auto-correlations" in row:
                    self.auto_correlation_steps = [int(s) for s in body[i + 2].split()]
                    self.auto_correlations = []
                    self.auto_correlation_pars = []
                    for entry in body[i + 3 :]:
                        if not entry.strip():
                            break
                        fields = entry.split(None, len(self.auto_correlation_steps) + 1)
                        self.auto_correlation_pars.append(fields[0])
                        self.auto_correlations.append([float(s) for s in fields[1:-1]])
        except Exception:
            print("Error reading: " + filename)
            raise

    def worstR(self, default=None):
        return self.R_eigs[len(self.R_eigs) - 1] if self.R_eigs else default


# ---------------------------------------------------------------------------
# significant-figure engine (exact Decimal arithmetic)
# ---------------------------------------------------------------------------


def float_to_decimal(f):
    """Exact float -> Decimal conversion (no precision loss)."""
    num, den = f.as_integer_ratio()
    top, bottom = decimal.Decimal(num), decimal.Decimal(den)
    ctx = decimal.Context(prec=60)
    quotient = ctx.divide(top, bottom)
    while ctx.flags[decimal.Inexact]:
        ctx.flags[decimal.Inexact] = False
        ctx.prec *= 2
        quotient = ctx.divide(top, bottom)
    return quotient


def numberFigs(number, sigfig, sci=False):
    """Format a number to ``sigfig`` significant figures using exact
    Decimal arithmetic; with ``sci`` returns (mantissa_str, exponent)
    switching to scientific form beyond 10^±4 (reference
    ``types.py:50-92``)."""
    assert sigfig > 0
    try:
        dec = decimal.Decimal(number)
    except TypeError:
        dec = float_to_decimal(float(number))
    exponent = 0
    if sci:
        exponent = dec.adjusted()
        if abs(exponent) > _sci_tolerance:
            dec = decimal.getcontext().multiply(dec, float_to_decimal(10.0**-exponent))
        else:
            exponent = 0
    sign, digits = dec.as_tuple()[0:2]
    digits = list(digits)
    if len(digits) < sigfig:
        digits += [0] * (sigfig - len(digits))
    place = dec.adjusted()
    rounded = int("".join(map(str, digits[:sigfig])))
    if len(digits) > sigfig and digits[sigfig] >= 5:
        rounded += 1
    chars = list(str(rounded))
    # rounding up can grow the digit count; fold that into the place shift
    place += len(chars) - sigfig
    chars = chars[:sigfig]
    if place >= sigfig - 1:
        chars += ["0"] * (place - sigfig + 1)
    elif place >= 0:
        chars.insert(place + 1, ".")
    else:
        chars = ["0."] + ["0"] * (-place - 1) + chars
    if sign:
        chars.insert(0, "-")
    text = "".join(chars)
    return (text, exponent) if sci else text


class NumberFormatter:
    """Significant-figure policy for values and their ± errors."""

    def __init__(self, sig_figs=4, separate_limit_tol=0.1, err_sf=2):
        self.sig_figs = sig_figs
        self.separate_limit_tol = separate_limit_tol
        self.err_sf = err_sf

    def _choose_sig_figs(self, value, limplus):
        """(value sig figs, error sig figs) adapted to the error scale."""
        frac = limplus / (abs(value) + limplus)
        sf = self.sig_figs
        if frac > 0.1 and 100 > value >= 20:
            sf = 2
        elif frac > 0.01 and value < 1000:
            sf = 3
        err_sf = self.err_sf
        if value >= 20 and frac > 0.1 and limplus >= 2:
            err_sf = 1
        return sf, err_sf

    def _match_decimals(self, value, res, sf, maxdp):
        """Re-format value so it has no more decimals than its errors."""
        while self.decimal_places(res) > maxdp:
            sf -= 1
            if sf == 0:
                res = "%.*f" % (maxdp, value)
                if float(res) == 0.0:
                    res = "%.*f" % (maxdp, 0)
                return res, sf
            res = self.formatNumber(value, sf)
        return res, sf

    def namesigFigs(self, value, limplus, limminus, wantSign=True, sci=False):
        """Format value and the two limits with consistent decimal places
        (reference ``types.py:102-141``)."""
        sf, err_sf = self._choose_sig_figs(value, limplus)
        exponent = 0
        if sci:
            # probe the exponent from the largest-magnitude end of the range
            widest = max(abs(value - limminus), abs(value + limplus))
            if exponent := self.formatNumber(widest, sci=True)[1]:
                scale = float_to_decimal(10.0**-exponent)
                value, limplus, limminus = (
                    decimal.getcontext().multiply(float_to_decimal(lim), scale)
                    for lim in [value, limplus, limminus]
                )
        plus_str = self.formatNumber(limplus, err_sf, wantSign)
        minus_str = self.formatNumber(limminus, err_sf, wantSign)
        maxdp = max(self.decimal_places(plus_str), self.decimal_places(minus_str))
        res, sf = self._match_decimals(value, self.formatNumber(value, sf), sf, maxdp)
        while self.decimal_places(plus_str) > self.decimal_places(res):
            sf += 1
            res = self.formatNumber(value, sf)
        if sci:
            return res, plus_str, minus_str, exponent
        return res, plus_str, minus_str

    def formatNumber(self, value, sig_figs=None, wantSign=False, sci=False):
        sf = self.sig_figs if sig_figs is None else sig_figs
        formatted = numberFigs(value, sf, sci=sci)
        exponent = None
        if sci:
            formatted, exponent = formatted
        if wantSign:
            if formatted[0] != "-" and float(formatted) < 0:
                formatted = "-" + formatted
            if float(formatted) > 0:
                formatted = "+" + formatted
        if sci:
            return formatted, exponent
        return formatted

    def decimal_places(self, s):
        dot = s.find(".")
        return len(s) - dot - 1 if dot > 0 else 0

    def plusMinusLimit(self, limit, upper, lower):
        return limit != 1 or abs(abs(upper / lower) - 1) > self.separate_limit_tol


# ---------------------------------------------------------------------------
# latex table machinery
# ---------------------------------------------------------------------------


class TableFormatter:
    """Lined latex table style.

    Style knobs are class attributes so variants are declared as plain
    subclass overrides; only derived pieces are computed per instance.
    """

    border = "|"
    endofrow = "\\\\"
    hline = "\\hline"
    paramText = "Parameter"
    aboveTitles = "\\hline"
    majorDividor = "|"
    minorDividor = "|"
    colDividor = "||"
    belowTitles = ""
    headerWrapper = " %s"
    noConstraint = "---"
    spacer = " "

    def __init__(self):
        self.colSeparator = f"{self.spacer}&{self.spacer}"
        self.numberFormatter = NumberFormatter()

    def getLine(self, position=None):
        if position is not None and hasattr(self, position):
            return getattr(self, position)
        return self.hline

    def belowTitleLine(self, colsPerParam, numResults=None):
        return self.getLine("belowTitles")

    def startTable(self, ncol, colsPerResult, numResults):
        block = self.majorDividor + (" c" + self.minorDividor) * (colsPerResult - 1) + " c"
        return (
            "\\begin{tabular} {"
            + self.border
            + " l "
            + block * numResults
            + (self.colDividor + " l " + block * numResults) * (ncol - 1)
            + self.border
            + "}"
        )

    def endTable(self):
        return "\\end{tabular}"

    def titleSubColumn(self, colsPerResult, title):
        return (
            " \\multicolumn{"
            + str(colsPerResult)
            + "}{"
            + self.majorDividor
            + "c"
            + self.majorDividor
            + "}{"
            + self.formatTitle(title)
            + "}"
        )

    def formatTitle(self, title):
        return "\\bf " + texEscapeText(title)

    def texEquation(self, txt):
        if txt and txt[0] != "$":
            return "$" + txt + "$"
        return txt

    def textAsColumn(self, txt, latex=False, separator=False, bold=False):
        width = len(txt) + (2 if latex else 0) + (11 if latex and bold else 0)
        cell = txt + self.spacer * max(0, 28 - width)
        if latex:
            cell = self.texEquation(cell)
            if bold:
                cell = "{\\boldmath" + cell + "}"
        if separator:
            cell += self.colSeparator
        return cell


class OpenTableFormatter(TableFormatter):
    """Open (no side borders) latex table style."""

    border = ""
    aboveTitles = r"\noalign{\vskip 3pt}\hline\noalign{\vskip 1.5pt}\hline\noalign{\vskip 5pt}"
    belowTitles = r"\noalign{\vskip 3pt}\hline"
    aboveHeader = ""
    belowHeader = r"\hline"
    minorDividor = ""
    belowFinalRow = ""

    def titleSubColumn(self, colsPerResult, title):
        return " \\multicolumn{%s}{c}{%s}" % (colsPerResult, self.formatTitle(title))


class NoLineTableFormatter(OpenTableFormatter):
    """Minimal-rule latex table style (the default)."""

    aboveHeader = ""
    minorDividor = ""
    majorDividor = ""
    belowFinalRow = r"\hline"
    belowBlockRow = r"\hline"
    colDividor = "|"
    hline = ""

    def belowTitleLine(self, colsPerParam, numResults=None):
        end_col = colsPerParam * numResults + 1
        return r"\noalign{\vskip 3pt}\cline{2-%d}\noalign{\vskip 3pt}" % end_col


class ResultTable:
    """A latex table of parameter statistics (multi-column, multi-result)."""

    def __init__(
        self, ncol, results, limit=2, tableParamNames=None, titles=None, formatter=None, numFormatter=None,
        blockEndParams=None, paramList=None, refResults=None, shiftSigma_indep=False, shiftSigma_subset=False
    ):
        """
        :param ncol: number of columns
        :param results: MargeStats/BestFit instance(s) (or objects exposing
            getMargeStats, e.g. MCSamples)
        :param limit: which stored limit to show (1 = 68%, 2 = 95% ...)
        :param tableParamNames: ParamNames restricting rows
        :param titles: per-result column titles
        :param formatter: a TableFormatter instance
        :param numFormatter: a NumberFormatter instance
        :param blockEndParams: parameter names ending visual blocks
        :param paramList: parameter name strings to include
        :param refResults: reference MargeStats for σ-shift annotations
        :param shiftSigma_indep: show shifts assuming independent data
        :param shiftSigma_subset: show shifts assuming nested data
        """
        results = [res.getMargeStats() if hasattr(res, "getMargeStats") else res for res in makeList(results)]
        self.lines = []
        self.format = formatter if formatter is not None else NoLineTableFormatter()
        if numFormatter is not None:
            self.format.numFormatter = numFormatter
        row_source = tableParamNames if tableParamNames is not None else results[0]
        self.tableParamNames = row_source.filteredCopy(paramList) if paramList is not None else row_source
        self.ncol, self.limit, self.results = ncol, limit, results
        self.boldBaseParameters = True
        self.colsPerResult = len(results[0].getColumnLabels(limit))
        self.colsPerParam = len(results) * self.colsPerResult
        self.refResults = refResults
        self.shiftSigma_indep, self.shiftSigma_subset = shiftSigma_indep, shiftSigma_subset

        self._layout_rows(blockEndParams, titles)

    def _layout_rows(self, blockEndParams, titles):
        """Column-major row layout, then emit all table lines."""
        names = self.tableParamNames.names
        numrow = -(-len(names) // self.ncol)
        strides = [names[c * numrow : (c + 1) * numrow] for c in range(self.ncol)]
        rows = [[col[r] for col in strides if r < len(col)] for r in range(numrow)]

        self.lines.append(self.format.startTable(self.ncol, self.colsPerResult, len(self.results)))
        if titles is not None:
            self.addTitlesRow(titles)
        self.addHeaderRow()
        block_ends = blockEndParams if self.ncol == 1 and blockEndParams is not None else ()
        for row in rows[:-1]:
            self.addFullTableRow(row)
            self.addLine("belowBlockRow" if row[0].name in block_ends else "belowRow")
        self.addFullTableRow(rows[-1])
        self.addLine("belowFinalRow")
        self.endTable()

    def _emit_row(self, cells):
        self.lines.append(self.format.colSeparator.join(cells) + self.format.endofrow)

    def addFullTableRow(self, row):
        cells = [self.paramLabelColumn(param) + self.paramResultsTex(param) for param in row]
        short = self.ncol - len(row)
        if short:
            pad = self.format.colSeparator * ((1 + self.colsPerParam) * short)
            cells[-1] += pad
        self._emit_row(cells)

    def addLine(self, position):
        rule = self.format.getLine(position)
        if rule is None:
            return self.lines
        return self.lines.append(rule)

    def addTitlesRow(self, titles):
        self.addLine("aboveTitles")
        cols = [self.format.titleSubColumn(1, "")]
        cols += [self.format.titleSubColumn(self.colsPerResult, title) for title in titles]
        self._emit_row(cols * self.ncol)
        rule = self.format.belowTitleLine(self.colsPerResult, self.colsPerParam // self.colsPerResult)
        if rule:
            self.lines.append(rule)

    def addHeaderRow(self):
        self.addLine("aboveHeader")
        wrap = self.format.headerWrapper.__mod__
        cols = [wrap(self.format.paramText)]
        for result in self.results:
            cols += [wrap(s) for s in result.getColumnLabels(self.limit)]
        self._emit_row(cols * self.ncol)
        self.addLine("belowHeader")

    def paramResultsTex(self, param):
        return self.format.colSeparator.join(self.paramResultTex(result, param) for result in self.results)

    def paramResultTex(self, result, p):
        values = result.texValues(
            self.format, p, self.limit, self.refResults,
            shiftSigma_subset=self.shiftSigma_subset, shiftSigma_indep=self.shiftSigma_indep,
        )
        if values is None:
            return self.format.textAsColumn("") * len(result.getColumnLabels(self.limit))
        txt = self.format.textAsColumn(values[1], True, separator=True) if len(values) > 1 else ""
        txt += self.format.textAsColumn(values[0], values[0] != self.format.noConstraint)
        return txt

    def paramLabelColumn(self, param):
        return self.format.textAsColumn(param.getLabel(), True, separator=True, bold=not param.isDerived)

    def endTable(self):
        self.lines.append(self.format.endTable())

    def tableTex(self, document=False, latex_preamble=None, packages=("amsmath", "amssymb", "bm")):
        """Latex string for the table (full document if requested)."""
        if not document:
            return "\n".join(self.lines)
        doc = [r"\documentclass{article}", r"\pagestyle{empty}"]
        doc += [r"\usepackage{%s}" % package for package in packages]
        doc.append("\\renewcommand{\\arraystretch}{1.5}")
        if latex_preamble:
            doc.append(latex_preamble)
        doc.append("\\begin{document}")
        doc += self.lines
        doc.append("\\end{document}")
        return "\n".join(doc)

    def write(self, fname, **kwargs):
        """Write the latex to a file."""
        TextFile(self.tableTex(**kwargs)).write(fname)

    def tablePNG(self, dpi=None, latex_preamble=None, filename=None, bytesIO=False):
        """Render the table to PNG via latex + dvipng (requires latex)."""
        import subprocess

        texfile = tempfile.mktemp(suffix=".tex")
        self.write(texfile, document=True, latex_preamble=latex_preamble)
        stem = os.path.splitext(texfile)[0]
        outfile = filename or stem + ".png"
        here = os.getcwd()

        def run_tool(command):
            flags = subprocess.CREATE_NO_WINDOW if os.name == "nt" else 0
            try:
                quiet = dict(stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
                subprocess.run(command, creationflags=flags, check=True, **quiet)
            except FileNotFoundError:
                tool = command[0] if command else "Command"
                message = f"Command not found: {tool}"
                if tool == "latex":
                    message += (
                        "\nLaTeX must be installed to generate tables. "
                        "Please install a TeX distribution like TeX Live, MiKTeX, or MacTeX."
                    )
                elif tool == "dvipng":
                    message += (
                        "\ndvipng must be installed to generate PNG images. "
                        "It is included in most LaTeX distributions."
                    )
                raise FileNotFoundError(message)

        try:
            os.chdir(os.path.dirname(texfile))
            run_tool(["latex", texfile])
            raster = ["dvipng"] + (["-D", str(dpi)] if dpi else [])
            raster += ["-T", "tight", "-x", "1000", "-z", "9", "--truecolor", "-o", outfile, stem + ".dvi"]
            run_tool(raster)
        finally:
            for scratch in [basefile + ext for ext in (".tex", ".dvi", ".aux", ".log")]:
                if os.path.isfile(scratch):
                    os.remove(scratch)
            os.chdir(here)
        if bytesIO:
            with open(outfile, "rb") as f:
                buffer = BytesIO(f.read())
            os.remove(outfile)
            buffer.seek(0)
            return buffer
        return outfile
