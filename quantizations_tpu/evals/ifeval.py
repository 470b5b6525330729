"""IFEval harness: instruction-following evaluation of a generate fn.

The reference's accuracy bar is "IFEval score identical to the bf16
model" (reference README.md:28) but ships no harness. This module is a
self-contained one: it reads the official ``input_data.jsonl`` format
(``{"key", "prompt", "instruction_id_list", "kwargs"}``), drives any
``prompt -> response`` callable (e.g. the continuous-batching Engine or
the jitted generate loop + tokenizer), and scores responses with
rule-based checkers for the most common instruction families.

The checker registry covers the high-frequency instruction ids; unknown
ids are reported as ``skipped`` rather than silently passed, so a score
is always conservative and comparable between two models evaluated with
the same harness — which is exactly what the parity claim needs (the
bf16 and 4-bit models are scored by identical rules).
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Callable, Dict, List, Optional

__all__ = ["check_instruction", "evaluate", "IFEvalResult", "CHECKERS"]


# --------------------------------------------------------------------------
# Instruction checkers: response text + kwargs -> bool
# --------------------------------------------------------------------------

def _num_words(text: str) -> int:
    return len(re.findall(r"\w+", text))


def _num_sentences(text: str) -> int:
    return len([s for s in re.split(r"[.!?]+", text) if s.strip()])


def _check_keywords_existence(text, keywords=(), **_):
    return all(k.lower() in text.lower() for k in keywords)


def _check_keywords_forbidden(text, forbidden_words=(), **_):
    return not any(k.lower() in text.lower() for k in forbidden_words)


def _check_keywords_frequency(text, keyword="", frequency=1,
                              relation="at least", **_):
    n = len(re.findall(re.escape(keyword.lower()), text.lower()))
    return n >= frequency if relation == "at least" else n < frequency


def _check_length_words(text, num_words=0, relation="at least", **_):
    n = _num_words(text)
    return n >= num_words if relation == "at least" else n < num_words


def _check_length_sentences(text, num_sentences=0, relation="at least", **_):
    n = _num_sentences(text)
    return (n >= num_sentences if relation == "at least"
            else n < num_sentences)


def _check_num_paragraphs(text, num_paragraphs=0, **_):
    paras = [p for p in re.split(r"\n\s*\*\s*\*\s*\*\s*\n|\*\*\*", text)
             if p.strip()]
    return len(paras) == num_paragraphs


def _check_num_bullets(text, num_bullets=0, **_):
    bullets = re.findall(r"^\s*[*-] ", text, flags=re.MULTILINE)
    return len(bullets) == num_bullets


def _check_title(text, **_):
    return re.search(r"<<[^<>]+>>", text) is not None


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
    return t.startswith('"') and t.endswith('"')


def _check_end_phrase(text, end_phrase="", **_):
    return text.rstrip().rstrip('."').lower().endswith(
        end_phrase.rstrip('."').lower())


def _check_all_lowercase(text, **_):
    return text == text.lower()


def _check_all_capital(text, **_):
    return text == text.upper()


def _check_capital_word_frequency(text, capital_frequency=0,
                                  capital_relation="at least", **_):
    n = len([w for w in re.findall(r"\b[A-Z]{2,}\b", text)])
    return (n >= capital_frequency if capital_relation == "at least"
            else n < capital_frequency)


def _check_repeat_prompt(text, prompt_to_repeat="", **_):
    return text.strip().lower().startswith(prompt_to_repeat.strip().lower())


def _check_two_responses(text, **_):
    return "******" in text


def _check_num_placeholders(text, num_placeholders=0, **_):
    return len(re.findall(r"\[[^\[\]]+\]", text)) >= num_placeholders


def _check_postscript(text, postscript_marker="P.S.", **_):
    return postscript_marker.lower() in text.lower()


def _check_num_sections(text, num_sections=0, section_spliter="Section",
                        **_):
    n = len(re.findall(
        rf"{re.escape(section_spliter)}\s+\d", text, flags=re.IGNORECASE))
    return n == num_sections


CHECKERS: Dict[str, Callable[..., bool]] = {
    "keywords:existence": _check_keywords_existence,
    "keywords:forbidden_words": _check_keywords_forbidden,
    "keywords:frequency": _check_keywords_frequency,
    "length_constraints:number_words": _check_length_words,
    "length_constraints:number_sentences": _check_length_sentences,
    "length_constraints:number_paragraphs": _check_num_paragraphs,
    "detectable_format:number_bullet_lists": _check_num_bullets,
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
