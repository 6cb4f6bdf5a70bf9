"""Cobaya interoperability: yaml info parsing and in-memory sample import.

Behavior-compatible with the reference (``getdist/cobaya_interface.py``):
reads Cobaya ``*.updated.yaml`` / ``*__full.yaml`` info files, classifies
sampled vs derived parameters, extracts prior ranges (including scipy.stats
distribution intervals and periodic flags), sampler type and temperature,
and builds MCSamples from live Cobaya collection objects.
"""

import logging
import os
from collections.abc import Mapping, Sequence
from copy import deepcopy
from importlib import import_module
from numbers import Number

import numpy as np

# Cobaya yaml key conventions
_label = "label"
_prior = "prior"
_params = "params"
_likelihood = "likelihood"
_sampler = "sampler"
_p_label = "latex"
_p_dist = "dist"
_p_value = "value"
_p_derived = "derived"
_p_renames = "renames"
_separator = "__"
_minuslogprior = "minuslogprior"
_prior_1d_name = "0"
_chi2 = "chi2"
_weight = "weight"
_minuslogpost = "minuslogpost"
_post = "post"

__all__ = [
    "cobaya_params_file",
    "MCSamplesFromCobaya",
    "get_info_params",
    "get_range",
    "is_sampled_param",
    "is_derived_param",
    "expand_info_param",
    "get_sampler_type",
    "get_sampler_temperature",
    "get_sample_label",
]


def cobaya_params_file(root):
    """Path of the Cobaya yaml info file for a chain root, or None."""
    sep = "" if root.endswith((os.sep, "/")) else "."
    candidate = root + sep + "updated.yaml"
    if os.path.exists(candidate):
        return candidate
    sep = "" if root.endswith((os.sep, "/")) else "__"
    candidate = root + sep + "full.yaml"
    if os.path.exists(candidate):
        return candidate
    return None


def yaml_file_or_dict(file_or_dict) -> Mapping:
    if isinstance(file_or_dict, str):
        from getdist_tpu.yaml_tools import yaml_load_file

        return yaml_load_file(file_or_dict)
    if isinstance(file_or_dict, Mapping):
        return file_or_dict
    raise ValueError("Cobaya parameter input must be a dictionary or filename")


def str_to_list(x):
    return [x] if isinstance(x, str) else x


def expand_info_param(info_param):
    """Normalize a parameter's info to the unambiguous dict form."""
    if not isinstance(info_param, Mapping):
        info_param = {} if info_param is None else {_p_value: info_param}
    else:
        info_param = deepcopy(info_param)
    if all(field not in info_param for field in (_prior, _p_value, _p_derived)):
        info_param[_p_derived] = True
    value = info_param.get(_p_value)
    if isinstance(value, str) or callable(value):
        info_param[_p_derived] = info_param.get(_p_derived, True)
    return info_param


def is_sampled_param(info_param):
    """True if the parameter has a prior (is sampled)."""
    return _prior in expand_info_param(info_param)


def is_derived_param(info_param):
    """True if the parameter is stored as derived."""
    return expand_info_param(info_param).get(_p_derived, False)


def get_info_params(info):
    """Full parameter info dict from Cobaya yaml info, including the
    minuslogprior/chi2 per-component derived entries and post-processing
    add/remove blocks."""
    info = yaml_file_or_dict(info)
    info_params_full = dict(info.get(_params) or {})
    priors = [_prior_1d_name] + list(info.get(_prior) or [])
    likes = list(info.get(_likelihood) or [])
    remove = info.get(_post, {}).get("remove", {})
    for param in remove.get(_params, []) or []:
        info_params_full.pop(param, None)
    for like in str_to_list(remove.get(_likelihood) or []):
        likes.remove(like)
    for prior in str_to_list(remove.get(_prior)) or []:
        priors.remove(prior)
    add = info.get(_post, {}).get("add", {})
    for param, pinfo in add.get(_params, {}).items():
        merged = info_params_full.get(param, {})
        merged.update(pinfo)
        info_params_full[param] = merged
    likes += list(add.get(_likelihood, []))
    priors += list(add.get(_prior, []))
    info_params_full[_minuslogprior] = {_p_label: r"-\log\pi"}
    for prior in priors:
        info_params_full[_minuslogprior + _separator + prior] = {
            _p_label: r"-\log\pi_\mathrm{" + prior.replace("_", r"\ ") + r"}"
        }
    info_params_full[_chi2] = {_p_label: r"\chi^2"}
    for like in likes:
        info_params_full[_chi2 + _separator + like] = {_p_label: r"\chi^2_\mathrm{" + like.replace("_", r"\ ") + r"}"}
    return info_params_full


def get_range(param_info):
    """(lower, upper, periodic) for a parameter's prior; None = unbounded.

    Supports explicit min/max, [min, max] lists, and loc/scale scipy.stats
    distributions via their full interval.
    """
    param_info = expand_info_param(param_info or {})
    periodic = param_info.get("periodic", False)
    if is_sampled_param(param_info):
        prior = param_info[_prior]
        if isinstance(prior, Sequence) and len(prior) == 2:
            prior = dict(zip(["min", "max"], prior))
        elif not isinstance(prior, Mapping):
            raise ValueError(
                "Format of prior not recognised: %r. "
                "Use '[min, max]' or a dictionary following Cobaya's documentation." % (prior,)
            )
        prior = dict(prior)
        periodic = periodic or prior.pop("periodic", False)
        lims = (None, None)
        if prior.get("min") is not None or prior.get("max") is not None:
            lims = (prior.get("min"), prior.get("max"))
        elif prior.get("loc") is not None or prior.get("scale") is not None:
            args = dict(prior)
            dist = args.pop(_p_dist, "uniform")
            pdf_dist = getattr(import_module("scipy.stats", dist), dist)
            lims = pdf_dist.interval(1, **args)
        return (
            lims[0] if lims[0] != -np.inf else None,
            lims[1] if lims[1] != np.inf else None,
            periodic,
        )
    value = param_info.get(_p_value)
    if isinstance(value, Number):
        return float(value), float(value), False
    return param_info.get("min"), param_info.get("max"), periodic


def get_sampler_key(filename_or_info, default_sampler_for_chain_type="mcmc"):
    return list(yaml_file_or_dict(filename_or_info).get(_sampler, [default_sampler_for_chain_type]))[0]


def get_sampler_type(filename_or_info, default_sampler_for_chain_type="mcmc"):
    """Sampler type string ('mcmc'/'nested'/...), polychord mapped to nested."""
    sampler = get_sampler_key(filename_or_info, default_sampler_for_chain_type)
    sampler_type = yaml_file_or_dict(filename_or_info).get(_sampler, {}).get(sampler, {}).get("sampler_type")
    if sampler_type is None:
        return "nested" if sampler == "polychord" else sampler
    return sampler_type


def get_sampler_temperature(filename_or_info):
    """Sampling temperature, 1 for post-processed chains, None if unknown."""
    info = yaml_file_or_dict(filename_or_info)
    if _sampler not in info:
        return None
    if _post in info:
        return 1
    return (info[_sampler][get_sampler_key(info)] or {}).get("temperature")


def get_sample_label(filename_or_info):
    return yaml_file_or_dict(filename_or_info).get(_label)


def get_burn_removed(filename_or_info):
    info = get_info_params(filename_or_info)
    return info.get(_post, {}).get("skip", 0)


def MCSamplesFromCobaya(info, collections, name_tag=None, ignore_rows=0, ini=None, settings=None):
    """Build :class:`~.mcsamples.MCSamples` from Cobaya run output.

    :param info: updated info dict from ``cobaya.run`` (or yaml filename)
    :param collections: Cobaya SampleCollection(s)
    :param name_tag: legend name for the sample
    :param ignore_rows: burn-in rows (int) or fraction (float < 1)
    :param ini: .ini analysis settings filename
    :param settings: dict of analysis setting overrides
    """
    if hasattr(collections, "data"):
        collections = [collections]
    try:
        columns = list(collections[0].data)
    except AttributeError:
        raise TypeError("The second argument does not appear to be a (list of) samples `Collection`.")
    if not all(list(c.data) == columns for c in collections[1:]):
        raise ValueError("The given collections don't have the same columns.")
    info_params = get_info_params(info)
    skip = info.get(_post, {}).get("skip", 0)
    if ignore_rows != 0 and skip != 0:
        logging.warning(
            "You are asking for rows to be ignored (%r), but some (%r) were already ignored in the original chain.",
            ignore_rows,
            skip,
        )
    var_params = [k for k, v in info_params.items() if is_sampled_param(v) or is_derived_param(v)]
    if set(columns[2:]) != set(var_params):
        raise AssertionError(
            "Info and collection(s) are not compatible, because their parameters differ: "
            "the collection(s) have %r and the info has %r. "
            "Are you sure that you are using an *updated* info dictionary "
            "(i.e. the output of `cobaya.run`)?" % (columns[2:], var_params)
        )
    names = [p + ("*" if is_derived_param(info_params[p]) else "") for p in columns[2:]]
    labels = [(info_params[p] or {}).get(_p_label, p) for p in columns[2:]]
    ranges = {p: get_range(info_params[p]) for p in info_params}
    renames = {p: info_params.get(p, {}).get(_p_renames, []) for p in columns[2:]}
    samples = [c[c.data.columns[2:]].values.astype(np.float64) for c in collections]
    weights = [c[_weight].values.astype(np.float64) for c in collections]
    loglikes = [c[_minuslogpost].values.astype(np.float64) for c in collections]
    sampler = get_sampler_type(info)
    temperature = get_sampler_temperature(info)
    label = get_sample_label(info)
    if temperature is not None and temperature != 1:
        logging.warning(
            "You have loaded a sample with non-unit temperature. "
            "Use the 'MCSamples.cool()' method to turn it into a sample from "
            "the original posterior before performing statistical analyses, "
            "but maybe after thinning the sample with method 'MCSamples.thin_indices()'."
        )
    from getdist_tpu.mcsamples import MCSamples

    return MCSamples(
        samples=samples,
        weights=weights,
        loglikes=loglikes,
        sampler=sampler,
        names=names,
        labels=labels,
        ranges=ranges,
        renames=renames,
        ignore_rows=ignore_rows,
        name_tag=name_tag,
        label=label,
        ini=ini,
        temperature=temperature,
        settings=settings,
    )
