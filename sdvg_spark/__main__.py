from sdvg_spark.cli import main

raise SystemExit(main())
