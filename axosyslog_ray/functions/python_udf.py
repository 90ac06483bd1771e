"""$(python) template functions from config-embedded `python {}` blocks.

Reference: modules/python/python-tf.c — `$(python fname arg...)` calls
fname(msg, b"arg1", ...) where msg is the dict-like LogMessage view and
extra args arrive as BYTES of the rendered argument templates
(python-tf.c:39 _py_construct_args_tuple); the return value is
stringified into the result, and any lookup/invoke/convert error yields
the literal "<error>" (python-tf.c:163). The reference embeds a CPython
interpreter to get this; this engine IS Python, so the block body execs
into a per-config namespace and the functions run inside map_batches
workers like any other scalar template function (config-scoped via the
ACTIVE_USER_FUNCS overlay — no process-global leakage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# hard macro name -> engine column (the py-log-message builtin handles)
_MSG_COLS = {"MESSAGE": "message", "MSG": "message", "Message": "message",
             "HOST": "host", "PROGRAM": "program", "PID": "pid",
             "MSGID": "msgid"}


class _PyMsg:
    """Row view with LogMessage subscript semantics: hard macros map to
    the engine's message columns, everything else resolves by column
    name; missing names read as empty string (log_msg_get_value)."""

    __slots__ = ("_row",)

    def __init__(self, row: dict):
        self._row = row

    def _resolve(self, key: str):
        col = _MSG_COLS.get(key, key)
        v = self._row.get(col)
        if v is None and col not in self._row:
            v = self._row.get(key)
        return v

    def __getitem__(self, key: str):
        v = self._resolve(str(key))
        if v is None or (not isinstance(v, (str, bytes, list, dict))
                         and pd.isna(v)):
            return ""
        return v

    def get(self, key: str, default=None):
        v = self._resolve(str(key))
        return default if v is None else v

    def keys(self):
        return self._row.keys()


def make_python_tf(namespace: dict):
    """Bind a `$(python ...)` template function over a config's executed
    python-block namespace (one closure per config — the overlay keeps
    it config-scoped)."""

    def tf_python(table: pa.Table, *arg_series) -> pd.Series:
        n = table.num_rows
        if not arg_series:
            return pd.Series([""] * n, dtype=object)
        names = (arg_series[0].to_numpy(dtype=object)
                 if isinstance(arg_series[0], pd.Series)
                 else np.full(n, arg_series[0], dtype=object))
        extras = [a.to_numpy(dtype=object) if isinstance(a, pd.Series)
                  else np.full(n, a, dtype=object) for a in arg_series[1:]]
        rows = table.to_pylist()
        out = np.empty(n, dtype=object)
        for i in range(n):
            fn = namespace.get(str(names[i]))
            if not callable(fn):
                out[i] = "<error>"
                continue
            try:
                args = [str(e[i] if e[i] is not None else "").encode()
                        for e in extras]
                ret = fn(_PyMsg(rows[i]), *args)
                if isinstance(ret, bytes):
                    out[i] = ret.decode("utf-8", "replace")
                elif ret is None:
                    out[i] = ""
                else:
                    out[i] = str(ret)
            except Exception:  # noqa: BLE001 — python-tf.c:163 <error>
                out[i] = "<error>"
        return pd.Series(out, dtype=object)

    return tf_python


def exec_python_block(code: str, namespace: dict) -> None:
    """Execute one config `python { ... }` block into `namespace`
    (python-confgen: blocks accumulate in a single module namespace)."""
    import textwrap

    exec(textwrap.dedent(code), namespace)  # noqa: S102 — user's own config
