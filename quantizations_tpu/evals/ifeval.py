"""IFEval harness: instruction-following evaluation of a generate fn.

The reference's accuracy bar is "IFEval score identical to the bf16
model" (reference README.md:28) but ships no harness. This module is a
self-contained one: it reads the official ``input_data.jsonl`` format
(``{"key", "prompt", "instruction_id_list", "kwargs"}``), drives any
``prompt -> response`` callable (e.g. the continuous-batching Engine or
the jitted generate loop + tokenizer), and scores responses with
rule-based checkers for the most common instruction families.

The checker registry ports the OFFICIAL google-research implementation's
logic for 24 of the 25 instruction ids (96% — language:response_language
needs langdetect and is skipped); behavior-distinguishing cases from the
official rules are pinned in tests/test_ifeval.py. Unknown ids are
reported as ``skipped`` rather than silently passed, so a score is
always conservative and comparable between two models evaluated with the
same harness — which is exactly what the parity claim needs (the bf16
and 4-bit models are scored by identical rules).
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Callable, Dict, List, Optional

__all__ = ["check_instruction", "evaluate", "IFEvalResult", "CHECKERS",
           "OFFICIAL_INSTRUCTION_IDS"]


# --------------------------------------------------------------------------
# Instruction checkers: response text + kwargs -> bool
# --------------------------------------------------------------------------

# The checkers below port the OFFICIAL google-research IFEval logic
# (instruction_following_eval/instructions.py) for every covered id:
# same regexes, same relation semantics ("at least" / "less than"),
# same edge-case handling (empty paragraph rules, isupper()/islower(),
# word-boundary forbidden words, strict two-responses splitting).
# Known approximation: number_sentences uses a regex splitter instead
# of the official nltk punkt tokenizer (nltk is not in this
# environment); simple prose agrees, abbreviation-heavy text can
# diverge. language:response_language is not covered (needs langdetect)
# and reports as skipped.

def _num_words(text: str) -> int:
    return len(re.findall(r"\w+", text))


def _num_sentences(text: str) -> int:
    return len([s for s in re.split(r"[.!?]+", text) if s.strip()])


def _check_keywords_existence(text, keywords=(), **_):
    # official: re.search(keyword, value, IGNORECASE) per keyword
    return all(re.search(k, text, flags=re.IGNORECASE) for k in keywords)


def _check_keywords_forbidden(text, forbidden_words=(), **_):
    # official: word-boundary search — "car" does NOT match "scarf"
    return not any(
        re.search(r"\b" + w + r"\b", text, flags=re.IGNORECASE)
        for w in forbidden_words)


def _check_keywords_frequency(text, keyword="", frequency=1,
                              relation="at least", **_):
    n = len(re.findall(keyword, text, flags=re.IGNORECASE))
    return n >= frequency if relation == "at least" else n < frequency


def _check_letter_frequency(text, letter="", let_frequency=1,
                            let_relation="at least", **_):
    n = text.lower().count(letter.lower())
    return (n >= let_frequency if let_relation == "at least"
            else n < let_frequency)


def _check_length_words(text, num_words=0, relation="at least", **_):
    n = _num_words(text)
    return n >= num_words if relation == "at least" else n < num_words


def _check_length_sentences(text, num_sentences=0, relation="at least", **_):
    n = _num_sentences(text)
    return (n >= num_sentences if relation == "at least"
            else n < num_sentences)


def _check_num_paragraphs(text, num_paragraphs=0, **_):
    # official: split on ***; empty FIRST/LAST chunks are dropped, an
    # empty INTERIOR chunk fails outright
    paras = re.split(r"\s?\*\*\*\s?", text)
    n = len(paras)
    for i, p in enumerate(paras):
        if not p.strip():
            if i in (0, len(paras) - 1):
                n -= 1
            else:
                return False
    return n == num_paragraphs


def _check_nth_paragraph_first_word(text, num_paragraphs=0,
                                    nth_paragraph=1, first_word="", **_):
    paras = re.split(r"\n\n", text)
    n = len(paras)
    for p in paras:
        if not p.strip():
            n -= 1
    if nth_paragraph <= len(paras):
        para = paras[nth_paragraph - 1].strip()
        if not para:
            return False
    else:
        return False
    word = para.split()[0].strip().lstrip("'\"")
    got = ""
    for ch in word:
        if ch in ".,?!'\"":
            break
        got += ch.lower()
    return n == num_paragraphs and got == first_word.lower()


def _check_num_bullets(text, num_bullets=0, **_):
    # official: "* item" lines (excluding "**bold") plus "-" lines
    star = re.findall(r"^\s*\*[^\*].*$", text, flags=re.MULTILINE)
    dash = re.findall(r"^\s*-.*$", text, flags=re.MULTILINE)
    return len(star) + len(dash) == num_bullets


def _check_constrained_response(text, **_):
    options = ("My answer is yes.", "My answer is no.",
               "My answer is maybe.")
    t = text.strip()
    return any(o in t for o in options)


def _check_highlighted_sections(text, num_highlights=0, **_):
    n = 0
    for h in re.findall(r"\*[^\n\*]*\*", text):
        if h.strip("*").strip():
            n += 1
    for h in re.findall(r"\*\*[^\n\*]*\*\*", text):
        if h.removeprefix("**").removesuffix("**").strip():
            n += 1
    return n >= num_highlights


def _check_title(text, **_):
    return any(t.strip("<>").strip()
               for t in re.findall(r"<<[^\n]+>>", text))


def _check_json_format(text, **_):
    try:
        json.loads(text.strip().removeprefix("```json").removeprefix("```")
                   .removesuffix("```").strip())
        return True
    except Exception:
        return False


def _check_no_comma(text, **_):
    return "," not in text


def _check_quotation(text, **_):
    t = text.strip()
    return len(t) > 1 and t.startswith('"') and t.endswith('"')


def _check_end_phrase(text, end_phrase="", **_):
    # official: strip whole-response whitespace and surrounding quotes
    # only — a trailing period after the phrase FAILS
    return text.strip().strip('"').lower().endswith(
        end_phrase.strip().lower())


def _check_all_lowercase(text, **_):
    return text.islower()


def _check_all_capital(text, **_):
    return text.isupper()


def _check_capital_word_frequency(text, capital_frequency=0,
                                  capital_relation="at least", **_):
    # official tokenizes with nltk and counts word.isupper() — single
    # capitals like "I" count
    n = sum(1 for w in re.findall(r"[A-Za-z]+", text) if w.isupper())
    return (n >= capital_frequency if capital_relation == "at least"
            else n < capital_frequency)


def _check_repeat_prompt(text, prompt_to_repeat="", **_):
    return text.strip().lower().startswith(prompt_to_repeat.strip().lower())


def _check_two_responses(text, **_):
    # official: split on ******; empty interior chunks fail, the two
    # responses must be non-empty and distinct
    chunks = text.split("******")
    valid = []
    for i, c in enumerate(chunks):
        if not c.strip():
            if i not in (0, len(chunks) - 1):
                return False
        else:
            valid.append(c)
    return len(valid) == 2 and valid[0].strip() != valid[1].strip()


def _check_num_placeholders(text, num_placeholders=0, **_):
    return len(re.findall(r"\[.*?\]", text)) >= num_placeholders


def _check_postscript(text, postscript_marker="P.S.", **_):
    t = text.lower()
    if postscript_marker == "P.P.S":
        pattern = r"\s*p\.\s?p\.\s?s.*$"
    elif postscript_marker == "P.S.":
        pattern = r"\s*p\.\s?s\..*$"
    else:
        pattern = r"\s*" + re.escape(postscript_marker.lower()) + r".*$"
    return bool(re.findall(pattern, t, flags=re.MULTILINE))


def _check_num_sections(text, num_sections=0, section_spliter="Section",
                        **_):
    # official: count splitter occurrences via re.split, AT LEAST
    # semantics, case-sensitive
    pattern = r"\s?" + re.escape(section_spliter) + r"\s?\d+\s?"
    return len(re.split(pattern, text)) - 1 >= num_sections


CHECKERS: Dict[str, Callable[..., bool]] = {
    "keywords:existence": _check_keywords_existence,
    "keywords:forbidden_words": _check_keywords_forbidden,
    "keywords:frequency": _check_keywords_frequency,
    "keywords:letter_frequency": _check_letter_frequency,
    "length_constraints:number_words": _check_length_words,
    "length_constraints:number_sentences": _check_length_sentences,
    "length_constraints:number_paragraphs": _check_num_paragraphs,
    "length_constraints:nth_paragraph_first_word":
        _check_nth_paragraph_first_word,
    "detectable_format:number_bullet_lists": _check_num_bullets,
    "detectable_format:constrained_response": _check_constrained_response,
    "detectable_format:number_highlighted_sections":
        _check_highlighted_sections,
    "detectable_format:title": _check_title,
    "detectable_format:json_format": _check_json_format,
    "detectable_format:multiple_sections": _check_num_sections,
    "detectable_content:number_placeholders": _check_num_placeholders,
    "detectable_content:postscript": _check_postscript,
    "punctuation:no_comma": _check_no_comma,
    "startend:quotation": _check_quotation,
    "startend:end_checker": _check_end_phrase,
    "change_case:english_lowercase": _check_all_lowercase,
    "change_case:english_capital": _check_all_capital,
    "change_case:capital_word_frequency": _check_capital_word_frequency,
    "combination:repeat_prompt": _check_repeat_prompt,
    "combination:two_responses": _check_two_responses,
}

# Official instruction-id universe (instructions_registry.py): 25 ids.
# Covered here: 24 (96%); language:response_language needs langdetect
# and reports as skipped.
OFFICIAL_INSTRUCTION_IDS = tuple(sorted(
    list(CHECKERS) + ["language:response_language"]))


def check_instruction(instruction_id: str, response: str,
                      kwargs: Optional[dict]) -> Optional[bool]:
    """True/False = pass/fail; None = no checker for this id."""
    fn = CHECKERS.get(instruction_id)
    if fn is None:
        return None
    kw = {k: v for k, v in (kwargs or {}).items() if v is not None}
    try:
        return bool(fn(response, **kw))
    except TypeError:
        return bool(fn(response))


@dataclasses.dataclass
class IFEvalResult:
    prompt_total: int = 0
    prompt_correct: int = 0           # strict prompt-level accuracy
    instruction_total: int = 0
    instruction_correct: int = 0
    skipped_instructions: int = 0

    @property
    def prompt_accuracy(self) -> float:
        return (self.prompt_correct / self.prompt_total
                if self.prompt_total else 0.0)

    @property
    def instruction_accuracy(self) -> float:
        return (self.instruction_correct / self.instruction_total
                if self.instruction_total else 0.0)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["prompt_accuracy"] = self.prompt_accuracy
        d["instruction_accuracy"] = self.instruction_accuracy
        return d


def evaluate(
    generate_fn: Callable[[str], str],
    dataset: List[dict],
) -> IFEvalResult:
    """Score ``generate_fn`` over IFEval examples.

    ``dataset``: list of dicts in the official jsonl schema. Use
    ``[json.loads(l) for l in open(path)]`` to load the released file.
    """
    res = IFEvalResult()
    for ex in dataset:
        response = generate_fn(ex["prompt"])
        ids = ex["instruction_id_list"]
        kwargs_list = ex.get("kwargs") or [{}] * len(ids)
        ok_all = True
        for iid, kw in zip(ids, kwargs_list):
            verdict = check_instruction(iid, response, kw)
            if verdict is None:
                res.skipped_instructions += 1
                ok_all = False
                continue
            res.instruction_total += 1
            if verdict:
                res.instruction_correct += 1
            else:
                ok_all = False
        res.prompt_total += 1
        if ok_all:
            res.prompt_correct += 1
    return res
