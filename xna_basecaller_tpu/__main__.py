"""``python -m xna_basecaller_tpu`` entry point."""

from xna_basecaller_tpu.cli import main

if __name__ == "__main__":
    main()
