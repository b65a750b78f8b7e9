"""Driver: run the reference analyze_paf.py unmodified under pandas>=3.

One reference line (analyze_paf.py:650, `paf_df.strand.replace({...},
inplace=True)`) silently no-ops under pandas 3's mandatory copy-on-write
(a Series accessor no longer writes through to its frame).  This driver
loads the reference module as-is and swaps its read_multiple_pafs for a
version returning a DataFrame subclass whose `.strand` attribute supports
the in-place replace by writing back to the parent frame — restoring the
pandas<2 behaviour the reference was written against.  No reference code
is copied or modified.

Usage: python run_ref_analyze.py <analyze_paf args...>
(cwd must be /root/reference so ./xna_libs resolves.)
"""

import importlib.util
import os
import sys

import pandas as pd

REF_SRC = "/root/reference/src"
sys.path.insert(1, REF_SRC)


class _StrandSeries(pd.Series):
    _metadata = ["_parent"]

    def replace(self, *a, inplace=False, **kw):
        out = pd.Series.replace(pd.Series(self), *a, inplace=False, **kw)
        parent = getattr(self, "_parent", None)
        if inplace and parent is not None:
            parent["strand"] = out
            return None
        return out


class _WriteThroughFrame(pd.DataFrame):
    @property
    def _constructor(self):
        return _WriteThroughFrame

    @property
    def strand(self):
        s = _StrandSeries(self["strand"])
        s._parent = self
        return s


def main():
    spec = importlib.util.spec_from_file_location(
        "ref_analyze_paf", os.path.join(REF_SRC, "tools", "analyze_paf.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_analyze_paf"] = mod
    spec.loader.exec_module(mod)

    orig_read = mod.read_multiple_pafs

    def read_multiple_pafs(*a, **kw):
        return _WriteThroughFrame(orig_read(*a, **kw))

    mod.read_multiple_pafs = read_multiple_pafs

    args = vars(mod.load_args())
    args.pop("print_args", None)
    mod.analyze_paf(**args)


if __name__ == "__main__":
    main()
