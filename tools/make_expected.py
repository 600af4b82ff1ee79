#!/usr/bin/env python3
"""Dev-only ground truth: EXECUTE the reference parser (/root/reference,
read-only) against our XML fixtures, reproducing each path's pre-parse
cleaning, and dump the parsed records as JSON.

lxml isn't installed; xml.etree.ElementTree has the same findtext/findall/
get API surface the reference parser uses, so we parse with ET. The
streaming path (artist/master/release) applies clean_xml_bytes per record
fragment (process.py:323); the label path applies clean_xml_content to the
whole document (process.py:262-266).
"""
import json
import re
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, "/root/reference/src")
from discogs_etl.parser import XMLParser          # noqa: E402
from discogs_etl.utils import clean_xml_bytes, clean_xml_content  # noqa: E402

FIX = "/root/repo/src/test/resources/fixtures"


def records(path, root_tag, item_tag, data_type):
    parser = XMLParser(data_type)
    raw = open(path, "rb").read()
    out = []
    if data_type == "label":
        cleaned = clean_xml_content(raw)
        root = ET.fromstring(cleaned)
        for elem in root.iter(item_tag):
            if elem is not root:
                out.append(parser.parse_element(elem))
        # iter() descends into sublabels/<label>; reference iterparse filters
        # parent==root (process.py:272) — keep only direct children.
        out = [parser.parse_element(e) for e in list(root) if e.tag == item_tag]
    else:
        # Streaming path: split into fragments like XMLFixerStreamReader,
        # clean each fragment, parse standalone (process.py:285-349).
        text = raw.decode("utf-8")
        frags = re.findall(rf"<{item_tag}[ >].*?</{item_tag}>|<{item_tag}>.*?</{item_tag}>",
                           text, flags=re.DOTALL)
        for frag in frags:
            cleaned = clean_xml_bytes(frag.encode("utf-8"))
            elem = ET.fromstring(cleaned)
            out.append(parser.parse_element(elem))
    return out


def main():
    expected = {
        "artist": records(f"{FIX}/artists.xml", "artists", "artist", "artist"),
        "label": records(f"{FIX}/labels.xml", "labels", "label", "label"),
        "master": records(f"{FIX}/masters.xml", "masters", "master", "master"),
        "release": records(f"{FIX}/releases.xml", "releases", "release", "release"),
    }
    print(json.dumps(expected, indent=1, ensure_ascii=False))


if __name__ == "__main__":
    main()
