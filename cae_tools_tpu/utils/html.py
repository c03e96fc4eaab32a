"""Minimal HTML5 report builder.

The reference vendors a DOM-based html5 kit (``utils/html5/*``,
``utils/table_fragment.py``, ``utils/image_fragment.py``) used only by the
model evaluator; per SURVEY.md §2.17 the behavior to preserve is the report
*content*, so this is a compact element-tree writer with the same public
surface the evaluator needs: nested elements, text, tables, and base64
inlined images, plus the pixelated-image CSS used for small rasters
(``utils/utils.py:19-28``).
"""

from __future__ import annotations

import base64
import html as _html
import io

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "source", "track", "wbr",
}

#: CSS forcing nearest-neighbour upscaling of small images in reports
PIXELATED_IMG_STYLE = """
img {
    image-rendering: pixelated;
    image-rendering: -moz-crisp-edges;
    -ms-interpolation-mode: nearest-neighbor;
}"""


def prepare_attrs(d: dict) -> dict:
    return {k: str(v) for (k, v) in d.items() if v is not None}


class Element:
    def __init__(self, tag: str, attrs=None, style=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        if style:
            self.attrs["style"] = "".join(f"{k}:{v};" for k, v in style.items())
        self.children = []  # Element | str

    def add_element(self, tag, attrs=None, style=None) -> "Element":
        child = Element(tag, attrs, style)
        self.children.append(child)
        return child

    def add_text(self, text) -> "Element":
        self.children.append(str(text))
        return self

    def add_fragment(self, fragment: "Element") -> "Element":
        self.children.append(fragment)
        return self

    def set_attribute(self, name, value) -> "Element":
        self.attrs[name] = value
        return self

    def render(self, out: io.StringIO, indent=0):
        pad = "    " * indent
        attrs = "".join(
            f' {k}="{_html.escape(str(v), quote=True)}"'
            for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            out.write(f"{pad}<{self.tag}{attrs}>\n")
            return
        out.write(f"{pad}<{self.tag}{attrs}>\n")
        for child in self.children:
            if isinstance(child, Element):
                child.render(out, indent + 1)
            else:
                out.write("    " * (indent + 1) + _html.escape(child) + "\n")
        out.write(f"{pad}</{self.tag}>\n")


class TableFragment(Element):
    """Simple table of rows of (str | Element) cells."""

    def __init__(self, attrs=None, style=None):
        super().__init__("table", attrs, style)

    def add_row(self, cells):
        tr = self.add_element("tr")
        for cell in cells:
            td = tr.add_element("td")
            if isinstance(cell, Element):
                td.add_fragment(cell)
            else:
                td.add_text(cell)


def inlined_image_src(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower()
    mime = {
        "gif": "image/gif",
        "png": "image/png",
        "jpg": "image/jpeg",
        "jpeg": "image/jpeg",
    }.get(ext)
    if mime is None:
        raise ValueError(f"Unable to guess mime type for: {path}")
    with open(path, "rb") as f:
        payload = base64.b64encode(f.read()).decode("ascii")
    return f"data:{mime};charset=US-ASCII;base64,{payload}"


class ImageFragment(Element):
    def __init__(self, src, alt_text="", w=None, h=None):
        super().__init__(
            "img", prepare_attrs({"src": src, "alt": alt_text, "width": w, "height": h})
        )


class InlineImageFragment(ImageFragment):
    def __init__(self, path, alt_text="", w=None, h=None):
        super().__init__(inlined_image_src(path), alt_text, w, h)


def array_png_data_uri(arr, vmin=None, vmax=None, cmap="coolwarm") -> str:
    """Render a 2-D array to an inline base64 PNG data URI (one pixel per
    cell; CSS pixelated scaling keeps cells crisp in the browser)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mimage
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    buf = io.BytesIO()
    mimage.imsave(buf, a, vmin=vmin, vmax=vmax, cmap=cmap, format="png")
    payload = base64.b64encode(buf.getvalue()).decode("ascii")
    return f"data:image/png;charset=US-ASCII;base64,{payload}"


def figure_fragment(fig, w=None) -> ImageFragment:
    """Inline a matplotlib figure as a base64 <img> without touching disk."""
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    payload = base64.b64encode(buf.getvalue()).decode("ascii")
    return ImageFragment(
        f"data:image/png;charset=US-ASCII;base64,{payload}", w=w
    )


class Html5Builder:
    def __init__(self, language="en"):
        self.root = Element("html", {"lang": language})
        self._head = self.root.add_element("head")
        self._body = self.root.add_element("body")

    def head(self) -> Element:
        return self._head

    def body(self) -> Element:
        return self._body

    def get_html(self) -> str:
        out = io.StringIO()
        out.write("<!DOCTYPE html>\n")
        self.root.render(out)
        return out.getvalue()
