"""Render the markdown tutorials as Jupyter notebooks.

The reference ships its tutorials as ``.ipynb`` rendered into Sphinx RST
(``/root/reference/docs/source/index.rst:1-27``); this repo's canonical
tutorial source is markdown with captured TPU output
(``docs/tutorials/*.md``).  This script closes the format gap: each
tutorial becomes ``docs/notebooks/<name>.ipynb`` where ``python`` fences
are code cells and a ``text`` fence that immediately follows one is
attached to it as captured stream output (so the notebook shows real
device results without requiring a TPU to re-execute).

Run from the repo root:  ``python docs/make_notebooks.py``
The generated notebooks are committed; re-run after editing a tutorial.
"""

import pathlib
import re

import nbformat
from nbformat.v4 import (
    new_code_cell,
    new_markdown_cell,
    new_notebook,
    new_output,
)

FENCE = re.compile(r"^```(\w*)\s*$")


def _parse_blocks(text):
    """Split markdown into ('md'|'code'|'out', body) blocks in order."""
    blocks = []
    lines = text.splitlines()
    buf, mode = [], "md"
    for line in lines:
        m = FENCE.match(line)
        if m and mode == "md":
            if buf:
                blocks.append(("md", "\n".join(buf).strip()))
            lang = m.group(1)
            buf, mode = [], ("code" if lang == "python" else
                            "out" if lang in ("text", "") else "fence-" +
                            lang)
        elif m and mode != "md":
            kind = mode if mode in ("code", "out") else "md"
            body = "\n".join(buf)
            if kind == "md":  # non-python fence: keep verbatim markdown
                body = f"```{mode[6:]}\n{body}\n```"
            blocks.append((kind, body))
            buf, mode = [], "md"
        else:
            buf.append(line)
    if buf and "\n".join(buf).strip():
        blocks.append(("md", "\n".join(buf).strip()))
    return [b for b in blocks if b[1].strip() or b[0] != "md"]


def convert(md_path, out_path):
    blocks = _parse_blocks(md_path.read_text())
    cells = []
    for kind, body in blocks:
        if kind == "code":
            cells.append(new_code_cell(body))
        elif kind == "out":
            # Captured output attaches to the most recent code cell
            # (tutorials put a "## Captured output" heading between the
            # final code block and its output fence).
            last_code = next((c for c in reversed(cells)
                              if c.cell_type == "code"), None)
            if last_code is not None:
                last_code.outputs = list(last_code.outputs) + [new_output(
                    "stream", name="stdout", text=body + "\n")]
                last_code.execution_count = 1
            else:  # output fence with no preceding code cell
                cells.append(new_markdown_cell(f"```\n{body}\n```"))
        else:
            cells.append(new_markdown_cell(body))
    # Deterministic cell ids (content + position hash): regeneration
    # is a no-op unless a tutorial actually changed.
    import hashlib
    for i, cell in enumerate(cells):
        cell["id"] = hashlib.sha1(
            f"{i}:{cell.source}".encode()).hexdigest()[:8]
    nb = new_notebook(
        cells=cells,
        metadata={
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
    )
    nbformat.validate(nb)
    out_path.write_text(nbformat.writes(nb) + "\n")


def main():
    root = pathlib.Path(__file__).parent
    out_dir = root / "notebooks"
    out_dir.mkdir(exist_ok=True)
    for md in sorted((root / "tutorials").glob("*.md")):
        target = out_dir / (md.stem + ".ipynb")
        convert(md, target)
        print(f"wrote {target.relative_to(root.parent)}")


if __name__ == "__main__":
    main()
