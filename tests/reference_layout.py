"""Test-side re-export of the reference-layout fixture generator.

The generator itself lives in the installed package
(``cmhse_tpu.data.fixtures``) because driver-contract entry points and the
serving bench/soak scripts need it without the tests/ tree present
(ADVICE r4); suite modules keep importing it from here.
"""

from cmhse_tpu.data.fixtures import (  # noqa: F401
    make_sentence,
    write_reference_dataset,
    write_word2vec_bin,
)
