"""Write-side XML editors: InsertXML / RemoveXML /
ConvertAttributesToElementsXML / ConvertTextToElementsXML.

Reference semantics (pkg/ottl/ottlfuncs/):
  - InsertXML(target, xpath, subdoc): append the sub-document's root
    nodes as last children of every element the XPath selects
    (func_insert_xml.go:42-80)
  - RemoveXML(target, xpath): remove selected elements; an XPath ending
    in /@name removes that attribute, /text() clears text content
    (func_remove_xml.go:43-78)
  - ConvertAttributesToElementsXML(target, xpath="//@*"): each selected
    attribute becomes a last-child element <name>value</name> and is
    removed from its parent (func_convert_attributes_to_elements_xml.go:44-69)
  - ConvertTextToElementsXML(target, xpath="/", element_name="value"):
    inside mixed-content elements, wrap each text node in
    <element_name>…</element_name> (func_convert_text_to_elements_xml.go:49-120)

Engine mapping. Spark's native XML surface (from_xml/xpath) is read-only,
so these editors run as Arrow-batched pandas UDFs over stdlib
xml.etree.ElementTree — compile/parse per value, no per-row Python UDF
registration (one vectorized batch function per editor). ElementTree
supports the XPath subset these editors are used with in the reference's
tests (absolute /a/b paths, //tag, *, [@attr], [@attr='v']); namespace
prefixes and positional predicates are out of scope and raise.

Serialization note: output is ElementTree's canonical form (attribute
order preserved, '"' quoting); byte-identical round-tripping of exotic
input formatting (CDATA, entity escapes) is not guaranteed — the
reference's own xmlquery serializer normalizes similarly.
"""

from __future__ import annotations

import copy
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_WRAP = "___ottl_xml_root___"


def _parse_fragments(text: str) -> ET.Element:
    """Parse possibly multi-root XML the way parseNodesXML does
    (func_remove_xml.go:91-108): wrap in a synthetic document node."""
    return ET.fromstring(f"<{_WRAP}>{text or ''}</{_WRAP}>")


def _serialize(wrapper: ET.Element) -> str:
    parts = [wrapper.text or ""]
    for child in wrapper:
        parts.append(ET.tostring(child, encoding="unicode"))
    return "".join(parts)


def _et_path(xpath: str) -> str:
    """Translate the editors' absolute XPath dialect to ElementTree's
    relative dialect rooted at the synthetic wrapper."""
    if xpath.startswith("//"):
        return "." + xpath  # //tag → .//tag (descendant-or-self)
    if xpath.startswith("/"):
        return "." + xpath
    return xpath


def _select_with_parents(wrapper: ET.Element, et_path: str):
    parent_of = {c: p for p in wrapper.iter() for c in p}
    return [(n, parent_of.get(n, wrapper)) for n in wrapper.findall(et_path)]


def insert_xml_value(target: str | None, xpath: str, subdoc: str | None) -> str | None:
    if target is None:
        return None
    wrapper = _parse_fragments(target)
    sub = _parse_fragments(subdoc or "")
    for node in wrapper.findall(_et_path(xpath)):
        for child in list(sub):
            node.append(copy.deepcopy(child))
    return _serialize(wrapper)


def remove_xml_value(target: str | None, xpath: str) -> str | None:
    if target is None:
        return None
    wrapper = _parse_fragments(target)
    if xpath.endswith("/text()"):
        for node in wrapper.findall(_et_path(xpath[: -len("/text()")])):
            node.text = None
        return _serialize(wrapper)
    attr = None
    path = xpath
    if "/@" in xpath:
        path, _, attr = xpath.rpartition("/@")
    if attr:
        for node in wrapper.findall(_et_path(path)):
            node.attrib.pop(attr, None)
        return _serialize(wrapper)
    for node, parent in _select_with_parents(wrapper, _et_path(path)):
        parent.remove(node)
    return _serialize(wrapper)


def convert_attributes_to_elements_value(target: str | None, xpath: str = "//*") -> str | None:
    if target is None:
        return None
    wrapper = _parse_fragments(target)
    # the reference default selects every attribute ("//@*"); the element
    # analogue is every element, converting each of its attributes
    et_path = _et_path("//*" if xpath in ("//@*", "") else xpath.replace("/@*", ""))
    for node in wrapper.findall(et_path):
        for name in list(node.attrib):
            child = ET.SubElement(node, name)
            child.text = node.attrib.pop(name)
    return _serialize(wrapper)


def convert_text_to_elements_value(
    target: str | None, xpath: str = "/", element_name: str = "value"
) -> str | None:
    if target is None:
        return None
    wrapper = _parse_fragments(target)

    def convert(parent: ET.Element, depth: int = 0) -> None:
        if depth > 1000:
            raise ValueError("exceeded maximum XML nesting depth")
        children = list(parent)
        for c in children:
            convert(c, depth + 1)
        has_elements = bool(children)
        texts = [parent.text] + [c.tail for c in children]
        has_text = any(t and t.strip() for t in texts)
        if not (has_elements and has_text):
            return
        # wrap each non-empty text run in <element_name>, preserving order
        new_children: list[ET.Element] = []
        if parent.text and parent.text.strip():
            e = ET.Element(element_name)
            e.text = parent.text.strip()
            new_children.append(e)
        parent.text = None
        for c in children:
            new_children.append(c)
            if c.tail and c.tail.strip():
                e = ET.Element(element_name)
                e.text = c.tail.strip()
                new_children.append(e)
            c.tail = None
        for c in children:
            parent.remove(c)
        for e in new_children:
            parent.append(e)

    targets = [wrapper] if xpath in ("/", "") else wrapper.findall(_et_path(xpath))
    for node in targets:
        convert(node)
    return _serialize(wrapper)


# --- Column wrappers (Arrow-batched) ---------------------------------------


def _batch_udf(fn, *consts):
    @pandas_udf("string")
    def run(s: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in s:
            yield batch.map(lambda v: None if v is None else fn(v, *consts))

    return run


def insert_xml(col: Column, xpath: str, subdoc_col: Column) -> Column:
    @pandas_udf("string")
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        for pdf in it:
            tgt, sub = pdf.iloc[:, 0], pdf.iloc[:, 1]
            yield pd.Series(
                [
                    None if t is None else insert_xml_value(t, xpath, s)
                    for t, s in zip(tgt, sub)
                ]
            )

    return run(F.struct(col, subdoc_col))


def remove_xml(col: Column, xpath: str) -> Column:
    return _batch_udf(remove_xml_value, xpath)(col)


def convert_attributes_to_elements_xml(col: Column, xpath: str = "//@*") -> Column:
    return _batch_udf(convert_attributes_to_elements_value, xpath)(col)


def convert_text_to_elements_xml(
    col: Column, xpath: str = "/", element_name: str = "value"
) -> Column:
    return _batch_udf(convert_text_to_elements_value, xpath, element_name)(col)
