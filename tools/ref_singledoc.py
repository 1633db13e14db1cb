#!/usr/bin/env python3
"""Single-thread comparator: the reference's post-processing hot loop
(lib/ocr_model.py get_alto_lines/ALTOLine + lib/ocr_step.py
textlines2data) ported verbatim to stdlib xml.etree (the container has
no lxml; ElementTree is C-accelerated, so this flatters — never
penalizes — the reference). Same scope as graft.SingleDocBench: XML
parse -> line model -> wrap/sanitize -> word count; the external
Tesseract/LanguageTool calls are out of scope on both sides.

Usage: python3 tools/ref_singledoc.py [n_iters]
"""
import sys
import time
import xml.etree.ElementTree as ET

FIXTURE = "/root/reference/tests/resources/500_gray00003.xml"
NS = {"alto3": "http://www.loc.gov/standards/alto/ns-v3#"}


class ALTOLine:  # lib/ocr_model.py:76-99
    def __init__(self, element):
        self.element = element
        self.element_id = element.attrib["ID"]
        strings = element.findall("alto3:String", NS)
        self.text_words = [e.attrib["CONTENT"] for e in strings]
        self.shape = self.get_shape(element)

    def get_shape(self, element):
        x_1 = int(element.attrib["HPOS"])
        y_1 = int(element.attrib["VPOS"])
        y_2 = y_1 + int(element.attrib["HEIGHT"])
        x_2 = x_1 + int(element.attrib["WIDTH"])
        return [(x_1, y_1), (x_2, y_1), (x_2, y_2), (x_1, y_2)]

    def get_textline_content(self):
        return " ".join(self.text_words)


def get_alto_lines(root, min_len=2):  # lib/ocr_model.py:222-228
    all_lines = root.findall(".//alto3:TextLine", NS)
    all_lines_len = [
        l for l in all_lines
        if len(" ".join(s.attrib["CONTENT"]
                        for s in l.findall("alto3:String", NS))) >= min_len]
    return [ALTOLine(line) for line in all_lines_len]


def _sanitize_wraps(lines):  # lib/ocr_step.py:472-495
    normalized = []
    n_normalized = 0
    for i, line in enumerate(lines):
        if i < len(lines) - 1 and line.endswith("-"):
            next_line = lines[i + 1]
            if len(next_line.strip()) == 0:
                continue
            next_line_tokens = next_line.split()
            nextline_first_token = next_line_tokens.pop(0)
            lines[i + 1] = " ".join(next_line_tokens)
            line = line[:-1] + nextline_first_token
            n_normalized += 1
        normalized.append(line)
    return (normalized, n_normalized)


def _sanitize_chars(lines):  # lib/ocr_step.py:497-514
    sanitized = []
    for line in lines:
        text = line.strip()
        bad_chars = "0123456789“„\"'?!*.;:-=[]()|"
        text = "".join([c for c in text if c not in bad_chars])
        if ".." in text:
            text = text.replace("..", "")
        if "  " in text:
            text = text.replace("  ", " ")
        if "ſ" in text:
            text = text.replace("ſ", "s")
        text = " ".join([t for t in text.split() if len(t) > 1])
        sanitized.append(text)
    return sanitized


def textlines2data(lines, minlen=2):  # lib/ocr_step.py:448-468
    non_empty = [l.get_textline_content() for l in lines
                 if len(l.get_textline_content()) > 0]
    (normalized, n_norm) = _sanitize_wraps(non_empty)
    filtered = _sanitize_chars(normalized)
    n_sparse = 0
    dense = []
    for f in filtered:
        if len(f) > minlen:
            dense.append(f)
        else:
            n_sparse += 1
    file_string = " ".join(dense)
    return (file_string, len(lines), n_norm, n_sparse, len(dense))


def once(xml_text):
    root = ET.fromstring(xml_text)
    lines = get_alto_lines(root)
    (file_string, _, _, _, _) = textlines2data(lines)
    return len(file_string.split())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    with open(FIXTURE, encoding="utf-8") as f:
        xml_text = f.read()
    for _ in range(20):
        words = once(xml_text)
    t0 = time.perf_counter()
    for _ in range(n):
        words = once(xml_text)
    dt = time.perf_counter() - t0
    print('{"metric":"ref-single-doc","docs_per_sec":%.2f,'
          '"ms_per_doc":%.3f,"n_words":%d}' % (n / dt, dt / n * 1000, words))


if __name__ == "__main__":
    main()
