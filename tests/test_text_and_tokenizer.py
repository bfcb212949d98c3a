import os

import pytest

from tortoise_tpu.utils.text import split_and_recombine_text
from tortoise_tpu.utils.tokenizer import VoiceBpeTokenizer
from tortoise_tpu.utils.cleaners import english_cleaners

from ref_loader import REFERENCE_ROOT, has_reference


def test_split_simple():
    text = """
    This is a sample sentence.
    This is another sample sentence.
    This is a longer sample sentence that should force a split inthemiddlebutinotinthislongword.
    "Don't split my quote... please"
    """
    assert split_and_recombine_text(text, desired_length=20, max_length=40) == [
        "This is a sample sentence.",
        "This is another sample sentence.",
        "This is a longer sample sentence that",
        "should force a split",
        "inthemiddlebutinotinthislongword.",
        '"Don\'t split my quote... please"',
    ]


def test_split_consecutive_boundaries():
    text = """
    When you are really angry sometimes you use consecutive exclamation marks!!!!!! Is this a good thing to do?!?!?!
    I don't know but we should handle this situation..........................
    """
    assert split_and_recombine_text(text, desired_length=30, max_length=50) == [
        "When you are really angry sometimes you use",
        "consecutive exclamation marks!!!!!!",
        "Is this a good thing to do?!?!?!",
        "I don't know but we should handle this situation.",
    ]


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_split_riding_hood_golden():
    path = os.path.join(REFERENCE_ROOT, "tortoise", "data", "riding_hood.txt")
    with open(path) as f:
        text = f.read()
    chunks = split_and_recombine_text(text)
    assert len(chunks) == 15
    assert chunks[0].startswith("Once upon a time")
    assert chunks[0].endswith("riding hood made for her.")
    assert chunks[-1].endswith("and ate her all up.")
    # every chunk respects the max length
    assert all(len(c) <= 300 for c in chunks)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_tokenizer_matches_reference_vocab():
    from tokenizers import Tokenizer

    ref = Tokenizer.from_file(os.path.join(REFERENCE_ROOT, "tortoise", "data", "tokenizer.json"))
    ours = VoiceBpeTokenizer()
    for text in [
        "Hello world, this is a test.",
        "The year 1984 was $12.50 worth of trouble; Mr. Jones paid 3rd time!",
        "I am a quick brown fox and I jump over 2,000 lazy dogs.",
        'Quotes "should be removed" entirely.',
    ]:
        cleaned = english_cleaners(text).replace(" ", "[SPACE]")
        assert ours.encode(text) == ref.encode(cleaned).ids, text
        # round trip
        assert ours.decode(ours.encode(text)) == english_cleaners(text).replace('"', "")


def test_cleaners_numbers():
    assert english_cleaners("I have 123 apples") == "i have one hundred twenty-three apples"
    assert english_cleaners("in 2015 AD") == "in twenty fifteen ad"
    assert english_cleaners("in 2000") == "in two thousand"
    assert english_cleaners("in 2005") == "in two thousand five"
    assert english_cleaners("1100 men") == "eleven hundred men"
    assert english_cleaners("the 3rd and 22nd") == "the third and twenty-second"
    assert english_cleaners("$5.25 please") == "five dollars, twenty-five cents please"
    assert english_cleaners("6.5 units") == "six point five units"
