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
        ("startend:end_checker", "It ends with peace",
         {"end_phrase": "peace"}, True),
    ]
    for iid, text, kw, want in cases:
        got = check_instruction(iid, text, kw)
        assert got == want, (iid, text, kw, got)


def test_official_behavior_cases():
    """Cases transcribed from the OFFICIAL google-research IFEval
    implementation's semantics (instruction_following_eval/
    instructions.py) — each one distinguishes the official rule from a
    naive implementation."""
    cases = [
        # forbidden words use WORD BOUNDARIES: "car" inside "scarf" ok
        ("keywords:forbidden_words", "a red scarf",
         {"forbidden_words": ["car"]}, True),
        ("keywords:forbidden_words", "a red car here",
         {"forbidden_words": ["car"]}, False),
        # letter frequency counts raw characters, case-insensitive
        ("keywords:letter_frequency", "Banana",
         {"letter": "a", "let_frequency": 3, "let_relation": "at least"},
         True),
        ("keywords:letter_frequency", "Banana",
         {"letter": "a", "let_frequency": 4, "let_relation": "at least"},
         False),
        # end_checker does NOT forgive a trailing period
        ("startend:end_checker", "Any other questions?.",
         {"end_phrase": "Any other questions?"}, False),
        ("startend:end_checker", '"so it goes"',
         {"end_phrase": "so it goes"}, True),
        # english_capital is str.isupper(): needs at least one cased char
        ("change_case:english_capital", "123 456", {}, False),
        ("change_case:english_capital", "ABC 123", {}, True),
        ("change_case:english_lowercase", "...", {}, False),
        # capital word frequency counts single capitals like "I"
        ("change_case:capital_word_frequency", "I am HERE now",
         {"capital_frequency": 2, "capital_relation": "at least"}, True),
        ("change_case:capital_word_frequency", "I am here now",
         {"capital_frequency": 2, "capital_relation": "at least"}, False),
        # two_responses: exactly two non-empty DISTINCT responses; an
        # empty interior chunk (two separators) fails
        ("combination:two_responses", "yes ****** yes", {}, False),
        ("combination:two_responses", "a ****** ****** b", {}, False),
        ("combination:two_responses", "first ****** second", {}, True),
        # paragraphs: *** separated; empty INTERIOR paragraph fails,
        # empty first/last are dropped
        ("length_constraints:number_paragraphs", "a\n***\nb\n***\nc",
         {"num_paragraphs": 3}, True),
        ("length_constraints:number_paragraphs", "a\n***\n***\nc",
         {"num_paragraphs": 2}, False),
        ("length_constraints:number_paragraphs", "***\na\n***\nb",
         {"num_paragraphs": 2}, True),
        # nth paragraph first word: \n\n paragraphs, punctuation-stripped
        ("length_constraints:nth_paragraph_first_word",
         "First para.\n\n'Second' one here.",
         {"num_paragraphs": 2, "nth_paragraph": 2,
          "first_word": "second"}, True),
        ("length_constraints:nth_paragraph_first_word",
         "First para.\n\nOther one.",
         {"num_paragraphs": 2, "nth_paragraph": 2,
          "first_word": "second"}, False),
        # bullets: "* x" and "- x" count, "**bold**" alone does not
        # start a bullet line
        ("detectable_format:number_bullet_lists",
         "* one\n- two\n**bold** text", {"num_bullets": 2}, True),
        # multiple_sections: AT LEAST semantics, case-sensitive splitter
        ("detectable_format:multiple_sections",
         "Section 1 a Section 2 b Section 3 c",
         {"section_spliter": "Section", "num_sections": 2}, True),
        ("detectable_format:multiple_sections",
         "section 1 a", {"section_spliter": "Section",
                         "num_sections": 1}, False),
        # constrained response: one of the three canned answers
        ("detectable_format:constrained_response",
         "Well. My answer is maybe.", {}, True),
        ("detectable_format:constrained_response",
         "Maybe yes.", {}, False),
        # highlighted sections: *x* and **x** both count
        ("detectable_format:number_highlighted_sections",
         "see *this* and **that**", {"num_highlights": 2}, True),
        ("detectable_format:number_highlighted_sections",
         "see ** only stars", {"num_highlights": 1}, False),
        # postscript: P.S. matches "P. S." too, anchored to a line
        ("detectable_content:postscript", "body\nP. S. more here",
         {"postscript_marker": "P.S."}, True),
        ("detectable_content:postscript", "no postscript",
         {"postscript_marker": "P.S."}, False),
        ("detectable_content:postscript", "body\nP.P.S remember",
         {"postscript_marker": "P.P.S"}, True),
        # placeholders: [.*?] non-greedy, empty brackets count
        ("detectable_content:number_placeholders", "[name] meets [me]",
         {"num_placeholders": 2}, True),
        # title must have non-empty content
        ("detectable_format:title", "<<>> no title", {}, False),
    ]
    for iid, text, kw, want in cases:
        got = check_instruction(iid, text, kw)
        assert got == want, (iid, text, kw, got)


def test_official_id_coverage():
    """24 of the 25 official instruction ids have checkers (96%);
    language:response_language is deliberately skipped (no langdetect
    in the environment)."""
    from quantizations_tpu.evals.ifeval import (
        CHECKERS, OFFICIAL_INSTRUCTION_IDS)

    assert len(OFFICIAL_INSTRUCTION_IDS) == 25
    covered = [i for i in OFFICIAL_INSTRUCTION_IDS if i in CHECKERS]
    assert len(covered) == 24
    assert "language:response_language" not in CHECKERS


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
