"""Built-in scalar UDF library, registered at engine startup.

Reference: streaming/core/compositor/spark/udf/Functions.scala:40-539 —
array/vector/matrix/time/misc helpers registered by SparkRuntime.postInit
(SparkRuntime.scala:186-198).  Where Spark now has a native function
(array_intersect, slice, concat_ws...) we register a thin SQL alias so
reference scripts keep working; vector ops use pyspark.ml.linalg
VectorUDT exactly like the reference.

Registration is idempotent per SparkSession.
"""

from __future__ import annotations

import uuid as _uuid

import numpy as np
from pyspark.ml.linalg import DenseMatrix, DenseVector, SparseVector, Vector, VectorUDT
from pyspark.sql import SparkSession, functions as F, types as T

import weakref

# keyed by the live session object — an id() key can be reused by a new
# session allocated at a freed address, silently skipping registration
_REGISTERED: "weakref.WeakSet" = weakref.WeakSet()


def register_all(spark: SparkSession) -> None:
    if spark in _REGISTERED:
        return
    _REGISTERED.add(spark)
    _register_array(spark)
    _register_vector(spark)
    _register_time(spark)
    _register_misc(spark)


# ---------------------------------------------------------------------------
# array functions (Functions.scala:50-54,303-404,419-427)
# ---------------------------------------------------------------------------

def _register_array(spark: SparkSession) -> None:
    udf = spark.udf.register

    udf("mkString", lambda sep, arr: (sep or "").join("" if x is None else str(x) for x in (arr or [])), "string")
    # array_intersect/array_slice/array_concat exist natively in Spark now;
    # register the reference-spelled aliases that differ:
    udf("array_index", lambda arr, v: arr.index(v) if arr and v in arr else -1, "int")
    udf("array_number_concat",
        lambda arrs: [float(x) for sub in (arrs or []) for x in (sub or [])],
        "array<double>")
    udf("array_number_to_string", lambda arr: [str(x) for x in (arr or [])], "array<string>")
    udf("array_string_to_double", lambda arr: [float(x) for x in (arr or [])], "array<double>")
    udf("array_string_to_float", lambda arr: [float(x) for x in (arr or [])], "array<float>")
    udf("array_string_to_int", lambda arr: [int(x) for x in (arr or [])], "array<int>")
    udf("to_array_double", lambda arr: [float(x) for x in (arr or [])], "array<double>")

    def array_onehot(arr, size):
        out = [0.0] * size
        for v in arr or []:
            if 0 <= int(v) < size:
                out[int(v)] = 1.0
        return out
    udf("array_onehot", array_onehot, "array<double>")

    def padding_int_array(arr, pad, size):
        arr = list(arr or [])[:size]
        return arr + [pad] * (size - len(arr))
    udf("padding_int_array", padding_int_array, "array<int>")

    def ngram(arr, n):
        arr = arr or []
        return [" ".join(arr[i:i + n]) for i in range(len(arr) - n + 1)]
    udf("ngram", ngram, "array<string>")

    # reference-EXACT spellings (the Scala method name IS the SQL name —
    # Functions.scala:303-427; a reference script calling arrayOneHot
    # must keep working).  Thin compat shims: hot paths should use the
    # native concat/slice/array_intersect expressions instead.
    udf("arrayOneHot", array_onehot, "array<double>")
    udf("paddingIntArray", padding_int_array, "array<int>")
    udf("toArrayDouble", lambda arr: [float(x) for x in (arr or [])],
        "array<double>")
    udf("array_concat",
        lambda arrs: [x for sub in (arrs or []) for x in (sub or [])],
        "array<string>")
    udf("array_slice",
        lambda arr, frm, to: list(arr or [])[int(frm):(int(to)
                                                       if int(to) >= 0
                                                       else None)],
        "array<string>")
    udf("map_value_int_to_double",
        lambda m: {k: float(v) for k, v in (m or {}).items()},
        "map<string,double>")


# ---------------------------------------------------------------------------
# vector/matrix functions (Functions.scala:69-300) — numpy-backed
# ---------------------------------------------------------------------------

def _register_vector(spark: SparkSession) -> None:
    udf = spark.udf.register
    VT = VectorUDT()

    # nested so UDF closures capture it BY VALUE — a module-level helper
    # pickles as a `streamingpro_spark.*` reference that executors can't
    # import when the driver isn't launched from the repo root
    def _as_np(v) -> np.ndarray:
        if isinstance(v, Vector):
            return v.toArray()
        return np.asarray(v, dtype=float)

    udf("vec_dense", lambda arr: DenseVector([float(x) for x in arr]), VT)
    udf("vec_sparse",
        lambda size, pairs: SparseVector(size, {int(k): float(v) for k, v in (pairs or {}).items()}),
        VT)
    udf("vec_array", lambda v: [float(x) for x in _as_np(v)], "array<double>")
    udf("vec_mk_string", lambda sep, v: sep.join(str(x) for x in _as_np(v)), "string")
    udf("vec_argmax", lambda v: int(np.argmax(_as_np(v))), "int")
    udf("vec_norm", lambda v, p: float(np.linalg.norm(_as_np(v), ord=p)), "double")
    udf("vec_sqdist", lambda a, b: float(np.sum((_as_np(a) - _as_np(b)) ** 2)), "double")
    udf("vec_cosine", lambda a, b: float(
        np.dot(_as_np(a), _as_np(b))
        / ((np.linalg.norm(_as_np(a)) * np.linalg.norm(_as_np(b))) or 1.0)), "double")
    udf("vec_concat", lambda vs: DenseVector(np.concatenate([_as_np(v) for v in vs])), VT)
    udf("vec_slice", lambda v, idxs: DenseVector(_as_np(v)[list(idxs)]), VT)
    udf("vec_range", lambda v, a, b: DenseVector(_as_np(v)[int(a):int(b)]), VT)
    # element-wise family: register BOTH our snake_case name and the
    # reference-exact camelCase SQL name (Scala method name IS the SQL
    # name — Functions.scala:69-300; reference scripts call vecWiseAdd)
    for names, fn in (
            (("vec_wise_mul", "vecWiseProduct"),
             lambda a, b: DenseVector(_as_np(a) * _as_np(b))),
            (("vec_wise_add", "vecWiseAdd"),
             lambda a, b: DenseVector(_as_np(a) + _as_np(b))),
            (("vec_wise_dif", "vecWiseDifference"),
             lambda a, b: DenseVector(_as_np(a) - _as_np(b))),
            (("vec_wise_mod", "vecWiseModulo"),
             lambda a, b: DenseVector(_as_np(a) % _as_np(b))),
            (("vec_inplace_add", "vecInplaceAddition"),
             lambda v, c: DenseVector(_as_np(v) + float(c))),
            (("vec_inplace_ew_mul", "vecInplaceElemWiseMul"),
             lambda v, c: DenseVector(_as_np(v) * float(c))),
            (("vec_ceil", "vecCeil"), lambda v: DenseVector(np.ceil(_as_np(v)))),
            (("vec_floor", "vecFloor"), lambda v: DenseVector(np.floor(_as_np(v))))):
        for n in names:
            udf(n, fn, VT)
    udf("vec_mean", lambda v: float(np.mean(_as_np(v))), "double")
    udf("vecMean", lambda v: float(np.mean(_as_np(v))), "double")
    udf("vec_stddev", lambda v: float(np.std(_as_np(v), ddof=1)), "double")
    udf("vecStd", lambda v: float(np.std(_as_np(v), ddof=1)), "double")

    def onehot(index, size):
        return SparseVector(int(size), {int(index): 1.0})
    udf("onehot", onehot, VT)

    udf("matrix_dense",
        lambda rows: [[float(x) for x in row] for row in (rows or [])],
        "array<array<double>>")  # nested-array matrix repr: composes with
    # matrix_sum/matrix_array (a DenseMatrix under a string SQL type could
    # never produce a usable value)
    udf("matrix_sum",
        lambda m, axis: [float(x) for x in np.asarray(m).sum(axis=int(axis))],
        "array<double>")
    udf("matrixSum",
        lambda m, axis: [float(x) for x in np.asarray(m).sum(axis=int(axis))],
        "array<double>")
    udf("matrix_array",
        lambda m: [[float(x) for x in row] for row in (m or [])],
        "array<array<double>>")


# ---------------------------------------------------------------------------
# time functions (Functions.scala:434-537)
# ---------------------------------------------------------------------------

def _register_time(spark: SparkSession) -> None:
    import datetime as dt
    udf = spark.udf.register

    # nested for by-value pickling (see _register_vector note)
    _UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
              "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
              "week": 604800, "weeks": 604800}

    def _parse_duration(spec: str) -> int:
        num, unit = spec.strip().split()
        return int(num) * _UNITS[unit.lower()]

    def _java2py_pattern(p: str) -> str:
        # minimal yyyy-MM-dd HH:mm:ss → strftime mapping
        return (p.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d")
                 .replace("HH", "%H").replace("mm", "%M").replace("ss", "%S"))

    udf("parseDateAsLong",
        lambda s, p="yyyy-MM-dd HH:mm:ss":
        int(dt.datetime.strptime(s, _java2py_pattern(p)).timestamp()), "long")
    udf("parseLongAsDate",
        lambda ts, p="yyyy-MM-dd HH:mm:ss":
        dt.datetime.fromtimestamp(int(ts)).strftime(_java2py_pattern(p)), "string")
    from pyspark.sql.functions import udf as _udf_f
    spark.udf.register(
        "timeAgo",
        _udf_f(lambda spec: int(dt.datetime.now().timestamp()
                                - _parse_duration(spec)),
               "long").asNondeterministic())
    udf("timePlus", lambda ts, spec: int(int(ts) + _parse_duration(spec)), "long")
    udf("timeMinus", lambda ts, spec: int(int(ts) - _parse_duration(spec)), "long")

    _BYTES = {"b": 1, "k": 1024, "kb": 1024, "m": 1024**2, "mb": 1024**2,
              "g": 1024**3, "gb": 1024**3, "t": 1024**4, "tb": 1024**4}

    def byte_string_as(s, unit_div):
        import re
        if s is None:
            return None
        m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]*)\s*", str(s))
        unit = (m.group(2) or "b").lower() if m else None
        if m is None or unit not in _BYTES:
            raise ValueError(
                f"byteStringAs: cannot parse {s!r} (expected e.g. '1g', "
                f"'1.5gb', '300m', '1024kb')")
        return int(float(m.group(1)) * _BYTES[unit]) // unit_div
    udf("byteStringAsBytes", lambda s: byte_string_as(s, 1), "long")
    udf("byteStringAsKb", lambda s: byte_string_as(s, 1024), "long")
    udf("byteStringAsMb", lambda s: byte_string_as(s, 1024**2), "long")
    udf("byteStringAsGb", lambda s: byte_string_as(s, 1024**3), "long")


# ---------------------------------------------------------------------------
# misc (Functions.scala:41-67,406-417) + crawler stubs
# ---------------------------------------------------------------------------

def _register_misc(spark: SparkSession) -> None:
    import hashlib
    import re
    import time
    udf = spark.udf.register

    # uuid/sleep must NOT be marked deterministic: the optimizer
    # deduplicates deterministic zero-arg calls (select uuid() a, uuid() b
    # would return the same id twice) and may re-evaluate them freely
    from pyspark.sql.functions import udf as _udf_f
    spark.udf.register(
        "uuid", _udf_f(lambda: str(_uuid.uuid4()).replace("-", ""),
                       "string").asNondeterministic())

    def _sleep(ms):
        time.sleep(int(ms) / 1000.0)
        return ""
    spark.udf.register("sleep", _udf_f(_sleep, "string").asNondeterministic())
    _CN_PUNCT = set("，。！？；：、“”‘’（）《》【】…—·")

    def keep_chinese(s, keep_punct=False, extras=None):
        kp = str(keep_punct).lower() in ("true", "1")
        return "".join(
            ch for ch in (s or "")
            if "一" <= ch <= "鿿"
            or (kp and ch in _CN_PUNCT)
            or (extras and ch in extras))
    udf("keepChinese", keep_chinese, "string")
    udf("crawler_md5", lambda s: hashlib.md5((s or "").encode()).hexdigest(), "string")
    # kafka value bytes → string (Functions.scala decodeKafka)
    udf("decodeKafka",
        lambda b: bytes(b).decode("utf-8", "replace") if b is not None else None,
        "string")

    def _parse_tokens(s):
        # Functions.scala `parse` segments Chinese with Ansj; the
        # dictionary-free fallback here: latin word runs + CJK bigrams
        # (same approach as TokenAnalysis segmenter="bigram")
        out = re.findall(r"[A-Za-z0-9_]+", (s or "").lower())
        for run in re.findall(r"[一-鿿]+", s or ""):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i:i + 2] for i in range(len(run) - 1))
        return out
    udf("parse", _parse_tokens, "array<string>")

    def crawler_extract_title(html):
        m = re.search(r"<title[^>]*>(.*?)</title>", html or "", re.S | re.I)
        return m.group(1).strip() if m else None
    udf("crawler_auto_extract_title", crawler_extract_title, "string")

    def crawler_extract_body(html):
        # heuristic: strip tags/scripts (reference uses boilerpipe-like lib)
        txt = re.sub(r"<(script|style)[^>]*>.*?</\1>", " ", html or "", flags=re.S | re.I)
        txt = re.sub(r"<[^>]+>", " ", txt)
        return re.sub(r"\s+", " ", txt).strip() or None
    udf("crawler_auto_extract_body", crawler_extract_body, "string")

    def crawler_request(url):
        # network fetch — gated: offline containers return None
        try:
            import urllib.request
            with urllib.request.urlopen(url, timeout=5) as r:  # noqa: S310
                return r.read().decode("utf-8", "replace")
        except Exception:
            return None
    udf("crawler_request", crawler_request, "string")

    def crawler_request_image(url):
        # reference crawler/udf/Functions.scala:62-67 — raw image bytes
        try:
            import urllib.request
            with urllib.request.urlopen(url, timeout=5) as r:  # noqa: S310
                return r.read()
        except Exception:
            return None
    udf("crawler_request_image", crawler_request_image, "binary")

    def crawler_http(url, method, items):
        # reference crawler/udf/Functions.scala:70-74 — request with a
        # method + form/query map; offline fetches degrade to None like
        # crawler_request (file:// GETs work for tests)
        try:
            import urllib.parse
            import urllib.request
            items = dict(items or {})
            method = (method or "GET").upper()
            if method == "GET":
                if items:
                    sep = "&" if "?" in url else "?"
                    url = url + sep + urllib.parse.urlencode(items)
                req = urllib.request.Request(url)
            else:
                req = urllib.request.Request(
                    url, data=urllib.parse.urlencode(items).encode(),
                    method=method)
            with urllib.request.urlopen(req, timeout=5) as r:  # noqa: S310
                return r.read().decode("utf-8", "replace")
        except Exception:
            return None
    udf("crawler_http", crawler_http, "string")

    def crawler_extract_xpath(html, xpath):
        # reference crawler/udf/Functions.scala:77-85 (Jsoup + Xsoup).
        # Stdlib form: tolerant HTML -> ElementTree, then ElementTree's
        # XPath SUBSET (tags, *, //, [@attr], [@attr='v'], [n]); a
        # trailing /text() or a bare element both yield the first
        # match's text content.
        if html is None or not xpath:
            return None
        try:
            import xml.etree.ElementTree as ET
            from html.parser import HTMLParser
            void = {"area", "base", "br", "col", "embed", "hr", "img",
                    "input", "link", "meta", "param", "source", "track",
                    "wbr"}

            class P(HTMLParser):
                def __init__(self):
                    super().__init__(convert_charrefs=True)
                    self.root = ET.Element("__root__")
                    self.stack = [self.root]

                def handle_starttag(self, tag, attrs):
                    el = ET.SubElement(self.stack[-1], tag,
                                       {k: (v or "") for k, v in attrs})
                    if tag not in void:
                        self.stack.append(el)

                def handle_data(self, data):
                    cur = self.stack[-1]
                    if len(cur):
                        cur[-1].tail = (cur[-1].tail or "") + data
                    else:
                        cur.text = (cur.text or "") + data

                def handle_endtag(self, tag):
                    for i in range(len(self.stack) - 1, 0, -1):
                        if self.stack[i].tag == tag:
                            del self.stack[i:]   # tolerate misnesting
                            break

            p = P()
            p.feed(html)
            p.close()
            xp = xpath
            if xp.endswith("/text()"):
                xp = xp[:-7]
            if xp.startswith("//"):
                xp = "." + xp
            elif xp.startswith("/"):
                xp = "." + xp
            el = p.root.find(xp)
            if el is None:
                return None
            return "".join(el.itertext()).strip()
        except Exception:
            return None
    udf("crawler_extract_xpath", crawler_extract_xpath, "string")
