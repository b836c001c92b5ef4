"""Regenerate docs/options.md from the live options registries.

Run:  HIOP_TPU_PLATFORM=cpu python docs/gen_options_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hiop_tpu.utils.options import NlpOptions, PriDecOptions, _IntOption, _NumOption, _StrOption


def _fmt(v):
    if isinstance(v, float):
        if v in (float("inf"), float("-inf")):
            return "inf" if v > 0 else "-inf"
        return repr(v)
    return str(v)


def _table(opts) -> str:
    lines = [
        "| option | type | default | range | description |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(opts._opts):
        o = opts._opts[name]
        if isinstance(o, _NumOption):
            typ, rng = "num", f"[{_fmt(o.lb)}, {_fmt(o.ub)}]"
        elif isinstance(o, _IntOption):
            typ, rng = "int", f"[{o.lb}, {o.ub}]"
        else:
            assert isinstance(o, _StrOption)
            typ = "str"
            rng = ", ".join(f"`{r}`" for r in o.range) if o.range is not None else "free"
        desc = (o.description or "").replace("|", "\\|").replace("\n", " ")
        lines.append(f"| `{name}` | {typ} | `{_fmt(o.default)}` | {rng} | {desc} |")
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "options.md")
    nlp, pd = NlpOptions.__new__(NlpOptions), PriDecOptions.__new__(PriDecOptions)
    # bypass cwd options-file auto-load so docs reflect pristine defaults
    nlp._opts, nlp._log = {}, None
    nlp._register_all()
    pd._opts, pd._log = {}, None
    pd._register_all()
    doc = f"""# Options reference

Generated from the registries in `hiop_tpu/utils/options.py` by
`docs/gen_options_md.py` — do not edit by hand. The registries mirror the
reference's `hiopOptions` (`src/Utils/hiopOptions.cpp:566-1704`): typed
options with validated ranges; invalid values are rejected with a warning
and the previous value kept; combinations are reconciled in
`ensure_consistence()`.

Options are set programmatically (`opts.update(name=value)`) or from an
options file (`hiop.options` / `hiop_pridec.options` in the working
directory, same discovery rule as the reference; one `name value` pair per
line, `#` comments).

## NLP solver options ({len(nlp._opts)})

{_table(nlp)}

## PriDec solver options ({len(pd._opts)})

{_table(pd)}
"""
    with open(out, "w") as f:
        f.write(doc)
    print(f"wrote {out}: {len(nlp._opts)} NLP + {len(pd._opts)} PriDec options")


if __name__ == "__main__":
    main()
