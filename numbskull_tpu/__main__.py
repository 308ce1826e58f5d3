"""python -m numbskull_tpu (reference: numbskull/__main__.py)."""

from numbskull_tpu.numbskull import main

main()
