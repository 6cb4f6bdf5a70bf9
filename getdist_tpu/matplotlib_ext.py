"""Matplotlib extensions: bounded tick location and full-sci-notation labels.

Behavior-compatible with the reference ``getdist/matplotlib_ext.py:9-382``
(tick-for-tick parity is regression-tested): ``BoundedMaxNLocator`` keeps
marks strictly inside the axis bounds, prunes labels that would collide with
the host ends (using an estimated label length from character count and font
aspect), falls back through "less nice" step groups, and guarantees at least
two marks where possible, even at odd spacings or half-phase offsets.
``SciFuncFormatter`` renders full scientific notation inside each tick label
instead of an origin text.
"""

import math
from bisect import bisect_left

import numpy as np
from matplotlib import ticker
from matplotlib.axis import YAxis

__all__ = ["BoundedMaxNLocator", "SciFuncFormatter"]

# minimum label extent in character units used in spacing heuristics
_min_label_len_chars = 1.35


class SciFuncFormatter(ticker.Formatter):
    """Tick formatter writing full scientific notation in each label."""

    def __call__(self, x, pos=None):
        return "$%s$" % SciFuncFormatter._format_sci_notation("%.10e" % x)

    def format_data(self, value):
        # plain text (e.g. navigation toolbar)
        return "%-8g" % value

    @staticmethod
    def _format_sci_notation(s):
        # compact "1e+004" style into latex "10^{4}" style
        mantissa, _, expo = s.partition("e")
        try:
            power = int(expo)
        except ValueError:
            return s
        mantissa = mantissa.rstrip("0").rstrip(".")
        power_tex = "10^{%d}" % power if power else ""
        if mantissa == "1" and power_tex:
            mantissa = ""
        if mantissa and power_tex:
            return r"%s{\times}%s" % (mantissa, power_tex)
        return mantissa + power_tex


def _across_decades(values, group):
    """Extend a step group across neighboring decades (0.1x, 1x, 10x),
    dropping the duplicated endpoints when the group already spans one."""
    if len(group) > 1 and 10 * group[0] == group[-1]:
        parts = (0.1 * values[:-1], values, 10 * values[1:])
    else:
        parts = (0.1 * values, values, 10 * values)
    return np.hstack(parts)


def _snap_tol(origin, step):
    """Edge-snapping tolerance for step-index rounding."""
    if origin > 0:
        digits = np.log10(origin / step)
        return min(0.4999, max(1e-10, 10 ** (digits - 12)))
    return 1e-10


def _last_index(x, origin, step):
    """Largest n with n*step <= x (snapping near-exact multiples)."""
    n, remainder = divmod(x, step)
    if abs(remainder / step - 1) < _snap_tol(abs(origin), step):
        return n + 1
    return n


def _first_index(x, origin, step):
    """Smallest n with n*step >= x (snapping near-exact multiples)."""
    n, remainder = divmod(x, step)
    if abs(remainder / step) < _snap_tol(abs(origin), step):
        return n
    return n + 1


class BoundedMaxNLocator(ticker.MaxNLocator):
    """Tick locator that only returns marks inside the axis bounds.

    Pruned marks never overlap the host ends; long labels are measured (by
    character count x font aspect) and the spacing re-solved to avoid
    label collisions or large tick-free gaps; fallback step groups and
    half-phase offsets are tried so at least two marks appear whenever they
    can fit.
    """

    def __init__(self, nbins="auto", prune=True, step_groups=([1, 2, 5, 10], [2.5, 3, 4, 6, 8], [1.5, 7, 9])):
        self.bounded_prune = prune
        self._step_groups = []
        self._offsets = []
        for group in step_groups:
            halves = [s // 2 if s % 2 < 1e-6 else 0 for s in group]
            self._step_groups.append(_across_decades(np.array(group), group))
            self._offsets.append(_across_decades(np.array(halves), group))
        super().__init__(nbins=nbins, steps=step_groups[0])

    def _bounded_prune(self, marks, est_len):
        if len(marks) > 1 and self.bounded_prune:
            if marks[0] - self._limits[0] < est_len * 0.5:
                marks = marks[1:]
            if self._limits[1] - marks[-1] < est_len * 0.5 and len(marks) > 1:
                marks = marks[:-1]
        return marks

    @staticmethod
    def _label_width_chars(fmt, value):
        text = fmt % value
        width = len(text)
        if "." in text:
            width -= 0.4
        return width

    def _get_label_len(self, marks):
        """Estimated label extent in data units for these tick values."""
        if not len(marks):
            return 0
        self._fmt.set_locs(marks)
        # extract the non-latex % format from the formatter
        template = self._fmt.format
        start = template.index("%")
        fmt = template[start : template.index("f", start) + 1]
        chars = self._label_width_chars(fmt, marks[0])
        if len(marks) > 1:
            chars = max(chars, self._label_width_chars(fmt, marks[-1]))
        return max(_min_label_len_chars, chars * self._aspect) * self._chars_to_data

    def _measure_axis(self):
        """(points-per-axis ratio denominator, label angle in degrees)."""
        host = self.axis.axes
        tick = self.axis._get_tick(True)
        angle = tick._labelrotation[1]
        if isinstance(self.axis, YAxis):
            angle += 90
            corners = host.transAxes.transform([[0, 0], [0, 1]])
            length = ((corners[1][1] - corners[0][1]) / host.figure.dpi) * 72
        else:
            corners = host.transAxes.transform([[0, 0], [1, 0]])
            length = ((corners[1][0] - corners[0][0]) / host.figure.dpi) * 72
        return tick.label1.get_size() / length, angle

    def tick_values(self, vmin, vmax):
        # MaxNLocator alone can put marks outside or too close to the axis
        # bounds, and its default aspect heuristic ignores actual label
        # width. Measure the label geometry, cut out-of-bound points, and
        # re-solve the spacing when labels are long or gaps are large.
        size_ratio, angle = self._measure_axis()
        upright = abs(math.cos(math.radians(angle)))
        self._aspect = 0.65 * upright
        self._chars_to_data = size_ratio * (vmax - vmin)
        self._fmt = self.axis.major.formatter
        self._limits = (vmin, vmax)

        # first-guess label geometry
        if upright > 0.05:
            est_len = size_ratio * 1.5 * (vmax - vmin)
            slot = est_len * 1.1
        else:
            # text orthogonal to the axis
            est_len = size_ratio * _min_label_len_chars * (vmax - vmin)
            slot = est_len * 1.25

        margin = est_len / 2 if self.bounded_prune else 0
        want = int((vmax - vmin - 2 * margin) / slot) + 1
        if want > 4:
            # leave more space between marks
            want = int((vmax - vmin - 2 * margin) / ((1.5 if want > 6 else 1.3) * slot)) + 1
        need = min(want, 2)
        want = min(self._nbins if self._nbins != "auto" else 9, want)
        # typical marks first, so the actual label length can be measured
        while True:
            marks, _ = self._spaced_ticks(vmin + margin, vmax - margin, est_len, need, want, False)
            if len(marks) or need == 1:
                break
            if want == 2:
                need -= 1
            want = max(need, 2)

        if not (upright > 0.05 and isinstance(self._fmt, ticker.ScalarFormatter) and len(marks) > 1):
            return self._bounded_prune(marks, est_len)

        est_len = self._get_label_len(marks)
        marks = self._bounded_prune(marks, est_len)
        if len(marks) > 1:
            step = marks[1] - marks[0]
        # re-solve on long labels, too-tight spacing, or big end gaps
        # (note: step is only read when >= 3 marks survived the prune)
        if (
            len(marks) < max(3, want)
            or step < est_len * (1.1 if len(marks) < 4 else 1.5)
            or (
                marks[0] - vmin > min(step * 1.01, est_len * 1.5)
                or vmax - marks[-1] > min(step * 1.01, est_len * 1.5)
            )
        ):
            marks = self._resolve_spacing(vmin, vmax, est_len, need, size_ratio)
        return marks

    def _resolve_spacing(self, vmin, vmax, est_len, need, size_ratio):
        """Re-derive tick spacing from the measured label length, dropping
        the minimum tick count as needed, with last-resort fallbacks."""
        margin = est_len / 2 if self.bounded_prune else 0
        for fac in (1.5, 1.35, 1.1):
            want = int((vmax - vmin - 2 * margin) / (fac * max(2 * self._chars_to_data, est_len))) + 1
            if want >= 4:
                break
        if self._nbins != "auto":
            want = min(self._nbins, want)
        need = min(need, want)
        allow_refit = True
        allow_shorter = True
        marks = []
        while need > 1:
            marks, settled = self._spaced_ticks(vmin + margin, vmax - margin, est_len, need, want)
            if len(marks):
                if not settled:
                    measured = self._get_label_len(marks)
                    if not np.isclose(measured, est_len):
                        est_len = measured
                        margin = est_len / 2 if self.bounded_prune else 0
                        if allow_refit:
                            allow_refit = False
                            continue
                        marks = self._bounded_prune(marks, est_len)
            elif need > 1 and allow_shorter:
                # the assumed label length may be blocking marks that exist
                margin /= 2
                est_len /= 2
                allow_shorter = False
                marks, _ = self._spaced_ticks(vmin + margin, vmax - margin, est_len, need, want)
                if len(marks):
                    est_len = self._get_label_len(marks)
                    margin = est_len / 2 if self.bounded_prune else 0
                    continue
            if (
                need == 1
                and len(marks) == 1
                or len(marks) >= need > 1
                and marks[1] - marks[0] > self._get_label_len(marks) * 1.1
            ):
                break
            need -= 1
            marks = []
        if len(marks) <= 1 and size_ratio * self._aspect < 0.9:
            decade, _ = ticker.scale_range(vmin, vmax, 1)
            # any two round points that fit
            for sc in (decade, decade / 10.0):
                marks = [round((vmin * 3 + vmax) / (4 * sc)) * sc, round((vmin + 3 * vmax) / (4 * sc)) * sc]
                if marks[0] != marks[1] and marks[0] >= vmin and marks[1] <= vmax:
                    if self._valid(marks):
                        return marks
            # or a single short round number somewhere in range (may have
            # been rejected only because companions lengthen the labels)
            center = round((vmin + vmax) / (2 * decade)) * decade
            if vmin < center < vmax:
                marks = [center]
                return self._bounded_prune(marks, self._get_label_len(marks))
        return marks

    def _valid(self, marks):
        est_len = self._get_label_len(marks)
        return (len(marks) < 2 or marks[1] - marks[0] > est_len * 1.1) and (
            not self.bounded_prune
            or (marks[0] - self._limits[0] > est_len / 2)
            and (self._limits[1] - marks[-1] > est_len / 2)
        )

    def _spaced_ticks(self, vmin, vmax, seed_len, min_ticks, want, changing_lengths=True):
        """Choose tick positions in [vmin, vmax] from the step groups.

        Returns (marks, settled): settled=True means the spacing was
        accepted outright; False means it is the keeper-scoring compromise
        (caller may re-measure labels and retry). Candidates walk nice
        ladder first, then coarser groups and half-phase offsets, scoring
        down crowding, big end gaps, and sparse coverage.
        """
        decade, origin = ticker.scale_range(vmin, vmax, want)
        lo = vmin - origin
        hi = vmax - origin
        width = hi - lo
        snap = width * 1e-6
        axis_span = self._limits[1] - self._limits[0]
        # a round value near the centre to pivot less-nice ladder on
        for sc in (100, 10, 1):
            pivot = round((lo + hi) / (2 * sc * decade)) * sc * decade
            if lo - snap <= pivot <= hi + snap:
                break

        est_len = seed_len * 1.1
        cap_step = max(est_len, width / ((want - 2) if want > 2 else 1))
        fill_step = width / max(1, (want - (0 if self.bounded_prune else 1)))
        keeper = []
        keeper_score = -np.inf
        for family, (family_steps, family_offsets) in enumerate(zip(self._step_groups, self._offsets)):
            ladder = family_steps * decade
            if family and len(keeper) < 3:
                cap_step = max(cap_step, width / 2)
            top = min(len(ladder) - 1, bisect_left(ladder, cap_step))
            if not top:
                continue
            # walk down from the upper-limit step; half-phase pass second
            for halfstep in (False, True):
                if halfstep and (len(keeper) > 2 or len(keeper) == 2 and (not pivot or family > 1)):
                    break
                for i in reversed(range(top + 1)):
                    if halfstep and not family_offsets[i]:
                        continue
                    step = ladder[i]
                    if step < est_len:
                        break

                    if family and lo <= pivot <= hi:
                        # hit round numbers in range with less-nice ladder
                        base = pivot - ((pivot - lo) // step) * step
                    else:
                        base = (lo // step) * step
                    if halfstep:
                        # e.g. -x/2, x/2 instead of -x, 0, x
                        nudge = decade * family_offsets[i]
                        if base - nudge >= lo:
                            base -= nudge
                        else:
                            base += nudge

                    sc = 10 ** (math.log10(step) // 1)
                    units = round(step / sc)
                    first = _first_index(lo - base, origin, step)
                    last = _last_index(hi - base, origin, step)
                    if not (min_ticks <= last - first + 1 <= want):
                        continue
                    cand = np.arange(first, last + 1) * step + (base + origin)

                    if halfstep and pivot and changing_lengths and step > 2 * sc:
                        # budge the comb to include a round number if possible
                        for budge in (0, -1, 1, -2, 2):
                            if abs(budge * sc) >= step / 2:
                                break
                            moved = cand + budge * sc
                            if any(np.round(moved / sc / 10) * 10 == np.round(moved / sc)) and self._valid(
                                moved
                            ):
                                cand = moved

                    flaws = self._assess(
                        cand, step, units, sc, est_len, fill_step, axis_span, min_ticks, want, family
                    )
                    if (flaws["sparse"] and flaws["gappy"] or flaws["crowded"]) and min(3, len(cand)) <= len(
                        keeper
                    ):
                        continue
                    if len(keeper) and flaws["gappy"] and family or changing_lengths and not self._valid(cand):
                        continue
                    score = self._score(cand, ladder, units, family, halfstep, flaws)
                    if score <= keeper_score:
                        continue
                    compromise = (
                        halfstep
                        and not family
                        or flaws["sparse"]
                        and (not len(keeper) or len(cand) < len(keeper))
                        or flaws["crowded"]
                        or flaws["scanty"]
                        or flaws["gappy"]
                    )
                    if not compromise:
                        return cand, True
                    # keep as compromise; prefer marks near the ends and not
                    # too close together in the centre
                    keeper = cand
                    keeper_score = score
        return keeper, False

    def _assess(self, cand, step, units, sc, est_len, fill_step, axis_span, min_ticks, want, family):
        """Flag layout defects of a candidate tick comb."""
        end_gap_limit = max(min(axis_span / 3, step), est_len * 1.1)
        if min_ticks <= 1:
            gappy = False
        elif self.bounded_prune:
            gappy = (len(cand) == 2 and step > axis_span * 0.7) or (
                cand[0] - self._limits[0] > end_gap_limit or self._limits[1] - cand[-1] > end_gap_limit
            )
        else:
            gappy = (len(cand) == 2 and step > axis_span * 0.7) or (
                len(cand) == 3
                and step > max(2 * est_len, axis_span / 3)
                and units > 1
                and round(cand[-1] / sc) % 10 > 0
            )
        return {
            "sparse": step > fill_step and step > est_len * 1.5,
            "gappy": gappy,
            "crowded": step < est_len * 1.3 and len(cand) > 2,
            "scanty": (len(cand) < 3 and (want > (3 if family else 4)) or (len(cand) < max(2, (want + 1) // 2)))
            and step > est_len * 1.5,
        }

    @staticmethod
    def _score(cand, ladder, units, family, halfstep, flaws):
        """Rank a compromise candidate (higher is better)."""
        score = -1 * flaws["scanty"] - family * 2 - flaws["crowded"] * 2 - flaws["gappy"] * 1
        if len(cand) < 3 and flaws["sparse"]:
            score -= 2
        if halfstep:
            score -= 3
        if units == 1.0 and not halfstep:
            score += 1
        if 0.0 in ladder:
            score += 1
        return score
