"""Deterministically learn a subset BPE merges file for COCO-style English.

The real CLIP vocab (``bpe_simple_vocab_16e6.txt.gz``, consumed by the
reference via open_clip at sparsify_clip.py:692) is a data file absent
from hermetic environments.  This script learns a small, fully
deterministic merge table from an embedded COCO-caption word-frequency
corpus using the standard BPE procedure (merge the most frequent
adjacent symbol pair; ties broken lexicographically), and writes it in
the exact open_clip merges format (header line + "sym1 sym2" lines,
gzipped) so both the Python and C++ tokenizers load it unchanged.

Output: sparsify_clip_tpu/text/data/coco_en_merges.txt.gz (committed
artifact — regenerate with `python scripts/build_bpe_vocab.py`).

Token ids under this vocab are self-consistent but do NOT equal
open_clip ids; drop the real vocab at $CLIP_BPE_PATH (or pass
``bpe_vocab_path``) for id-level open_clip parity.  Models here train
from scratch, so the vocab changes granularity, not capability.
"""

from __future__ import annotations

import collections
import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from sparsify_clip_tpu.text.tokenizer import bytes_to_unicode  # noqa: E402

# COCO-caption word frequencies (hand-curated, relative scale): the
# determiner/verb/noun inventory that dominates MS-COCO captions.
CORPUS = """
a 1000 the 500 on 300 man 300 in 250 woman 250 with 220 and 200 people 200
of 180 person 150 is 150 two 150 sitting 150 table 150 street 120 dog 120
cat 120 an 120 to 120 standing 120 at 100 are 100 riding 100 horse 80
holding 90 water 90 train 90 boy 80 girl 80 field 80 grass 80 plate 80
car 80 bus 80 white 80 large 70 next 80 beach 70 elephant 70 giraffe 70
pizza 70 truck 70 walking 70 playing 70 young 70 black 70 baseball 70
group 70 room 70 near 70 snow 60 tree 60 street 60 food 60 bird 60 child 60
men 60 kitchen 60 boat 60 building 60 motorcycle 60 eating 60 wearing 60
red 60 blue 60 road 60 small 60 tennis 50 women 50 zebra 50 bear 50 bed 50
chair 50 trees 50 sign 50 green 50 park 50 skateboard 50 bike 50 bicycle 50
airplane 50 sandwich 50 banana 50 bowl 50 by 50 some 50 top 50 sink 40
bathroom 50 toilet 40 sheep 40 cow 40 couch 40 laptop 40 computer 40
umbrella 40 bench 40 cup 40 glass 40 cake 40 plane 40 surfboard 40 his 40
her 30 it 40 there 40 yellow 40 brown 40 big 40 little 40 looking 40
flying 40 laying 40 parked 40 sidewalk 40 ocean 40 sky 40 city 40 ball 40
animal 40 living 40 player 40 crowd 30 kite 30 clock 30 phone 35 shirt 30
that 30 for 30 from 30 down 30 over 30 hot 30 fruit 30 up 40 fence 30
window 30 door 30 wall 30 light 30 flowers 30 floor 30 ground 30 old 30
wooden 30 many 30 jumping 30 running 30 covered 30 skiing 30 surfing 30
picture 30 dirt 25 sand 25 hill 25 mountain 25 area 25 lot 25 counter 25
bottle 25 desk 25 book 25 donut 25 vase 25 tv 25 television 25 cell 25
broccoli 30 bananas 30 vegetables 25 buildings 25 snowy 25 tall 25 court 25
game 25 frisbee 25 bat 25 hat 25 behind 25 around 25 while 25 driving 25
watching 25 filled 25 photo 25 orange 25 teddy 30 out 25 under 25 smiling 20
carrying 20 hanging 20 talking 20 doing 20 skateboarding 20 luggage 15
racket 20 soccer 15 glove 10 helmet 15 jacket 15 suit 15 tie 20 dress 12
suitcase 12 bag 20 day 20 night 15 image 15 long 20 open 20 full 20 back 20
gray 20 keyboard 20 oven 20 refrigerator 20 microwave 15 remote 15 pole 20
bridge 20 tower 20 mirror 20 outside 20 inside 20 sits 20 stands 15 into 15
through 15 above 15 beside 15 together 15 very 15 stuffed 15 empty 15
busy 15 few 15 middle 15 pink 15 waves 15 wave 20 air 30 background 20
posing 15 catching 15 hitting 15 throwing 15 swinging 15 snowboarding 15
waiting 15 crossing 15 sleeping 15 drinking 15 cutting 15 making 15
taking 15 shelf 15 scissors 15 flower 20 animals 30 children 40 front 60
side 40 three 60 four 30 several 40 each 15 other 30 off 15 as 20
colorful 12 different 12 various 12 close 12 reading 10 getting 10
going 10 coming 10 rides 10 holds 10 walks 10 plays 10 rider 15 dogs 20
traffic 30 vehicle 20 parking 20 washing 10 brushing 10 talks 8 station 15
airport 12 zoo 10 herd 15 flock 8 bunch 12 pair 12 slice 12 piece 12
"""

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir,
    "sparsify_clip_tpu", "text", "data", "coco_en_merges.txt.gz",
)


def learn_merges(word_counts, min_count=2):
    """Classic BPE learning over word types: repeatedly merge the most
    frequent adjacent symbol pair (ties → lexicographically smallest
    pair) until no pair occurs min_count times."""
    b2u = bytes_to_unicode()
    words = {}
    for word, count in word_counts.items():
        mapped = "".join(b2u[b] for b in word.encode("utf-8"))
        symbols = tuple(mapped[:-1]) + (mapped[-1] + "</w>",)
        words[symbols] = words.get(symbols, 0) + count

    merges = []
    while True:
        pairs = collections.Counter()
        for symbols, count in words.items():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += count
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        (first, second), count = best
        if count < min_count:
            break
        merges.append((first, second))
        merged = first + second
        new_words = {}
        for symbols, count in words.items():
            out, i = [], 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == first
                    and symbols[i + 1] == second
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + count
        words = new_words
    return merges


def main():
    tokens = CORPUS.split()
    word_counts = {
        tokens[i]: int(tokens[i + 1]) for i in range(0, len(tokens), 2)
    }
    merges = learn_merges(word_counts)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    body = "#version: coco_en subset merges (deterministic; " \
           "scripts/build_bpe_vocab.py)\n"
    body += "".join(f"{first} {second}\n" for first, second in merges)
    # mtime=0 so the committed artifact is byte-reproducible
    with open(OUT, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as fh:
            fh.write(body.encode("utf-8"))
    print(f"{len(merges)} merges -> {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
