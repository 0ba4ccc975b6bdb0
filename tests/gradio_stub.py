"""Minimal gradio test double (r2 VERDICT missing #4 / next #9).

gradio is not installable in this environment, so the reference's webUI.py
surface (`/root/reference/webUI.py:275-427`) could never render in CI. This
stub implements just enough of the gradio API for
``sovits_tpu.serving.webui.build_app()`` to construct its full component
tree and for tests to *execute* the click callbacks: components record
their labels/values, Blocks records every ``Button.click`` binding.

Inject before importing the webui module::

    sys.modules.setdefault("gradio", tests.gradio_stub)
"""

from __future__ import annotations

_CURRENT = None  # Blocks being built (set by Blocks.__enter__)


class Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        self.value = kwargs.get("value")
        if _CURRENT is not None:
            _CURRENT.components.append(self)


class Textbox(Component):
    pass


class Number(Component):
    pass


class Audio(Component):
    pass


class Checkbox(Component):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.value is None:
            self.value = False


class Dataframe(Component):
    pass


class Markdown(Component):
    def __init__(self, text: str = "", **kwargs):
        super().__init__(**kwargs)
        self.text = text


class Dropdown(Component):
    def __init__(self, choices=None, **kwargs):
        super().__init__(**kwargs)
        self.choices = list(choices or [])


class Radio(Dropdown):
    pass


class Slider(Component):
    def __init__(self, minimum=0, maximum=1, value=0, **kwargs):
        kwargs.setdefault("value", value)
        super().__init__(**kwargs)
        self.minimum, self.maximum = minimum, maximum


class _Container(Component):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Tab(_Container):
    def __init__(self, label: str = "", **kwargs):
        kwargs.setdefault("label", label)
        super().__init__(**kwargs)


class Row(_Container):
    pass


class Column(_Container):
    pass


class Button(Component):
    def __init__(self, label: str = "", **kwargs):
        kwargs.setdefault("label", label)
        super().__init__(**kwargs)

    def click(self, fn, inputs=None, outputs=None, **kwargs):
        def as_list(x):  # gradio accepts a single component or a list
            if x is None:
                return []
            return list(x) if isinstance(x, (list, tuple)) else [x]

        if _CURRENT is not None:
            _CURRENT.clicks.append(
                {"label": self.label, "fn": fn,
                 "inputs": as_list(inputs), "outputs": as_list(outputs)}
            )
        return self


class Blocks:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.components: list[Component] = []
        self.clicks: list[dict] = []
        self.launched = False

    def __enter__(self):
        global _CURRENT
        _CURRENT = self
        return self

    def __exit__(self, *exc):
        global _CURRENT
        _CURRENT = None
        return False

    def launch(self, **kwargs):
        self.launched = True
        return self

    # test helpers -------------------------------------------------------
    def click_fn(self, label: str):
        """The callback bound to the button with this label."""
        for c in self.clicks:
            if c["label"] == label:
                return c["fn"]
        raise KeyError(label)

    def tabs(self):
        return [c.label for c in self.components if isinstance(c, Tab)]
