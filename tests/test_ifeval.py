"""IFEval harness checker tests (evals/ifeval.py)."""

from quantizations_tpu.evals.ifeval import (
    IFEvalResult,
    check_instruction,
    evaluate,
)


def test_checkers():
    cases = [
        ("keywords:existence", "the quick brown fox",
         {"keywords": ["quick", "fox"]}, True),
        ("keywords:existence", "the quick brown fox",
         {"keywords": ["dog"]}, False),
        ("keywords:forbidden_words", "all clear here",
         {"forbidden_words": ["bad"]}, True),
        ("keywords:frequency", "go go go",
         {"keyword": "go", "frequency": 3, "relation": "at least"}, True),
        ("length_constraints:number_words", "one two three",
         {"num_words": 2, "relation": "at least"}, True),
        ("length_constraints:number_words", "one two three",
         {"num_words": 2, "relation": "less than"}, False),
        ("punctuation:no_comma", "no commas here", {}, True),
        ("punctuation:no_comma", "a, b", {}, False),
        ("startend:quotation", '"quoted text"', {}, True),
        ("detectable_format:title", "<<My Title>> body", {}, True),
        ("detectable_format:json_format", '{"a": 1}', {}, True),
        ("detectable_format:json_format", "not json", {}, False),
        ("change_case:english_lowercase", "all lower", {}, True),
        ("change_case:english_capital", "ALL UPPER", {}, True),
        ("detectable_format:number_bullet_lists",
         "* one\n* two", {"num_bullets": 2}, True),
        ("combination:two_responses", "a ****** b", {}, True),
        ("startend:end_checker", "It ends with peace.",
         {"end_phrase": "peace"}, True),
    ]
    for iid, text, kw, want in cases:
        got = check_instruction(iid, text, kw)
        assert got == want, (iid, text, kw, got)


def test_unknown_instruction_is_skipped_not_passed():
    assert check_instruction("nonexistent:checker", "text", {}) is None


def test_evaluate_end_to_end():
    dataset = [
        {"key": 1, "prompt": "p1",
         "instruction_id_list": ["punctuation:no_comma"],
         "kwargs": [{}]},
        {"key": 2, "prompt": "p2",
         "instruction_id_list": ["keywords:existence"],
         "kwargs": [{"keywords": ["missing"]}]},
    ]
    res = evaluate(lambda p: "no commas in this response", dataset)
    assert res.prompt_total == 2
    assert res.prompt_correct == 1
    assert res.instruction_total == 2
    assert res.instruction_correct == 1
    assert 0.0 <= res.prompt_accuracy <= 1.0
