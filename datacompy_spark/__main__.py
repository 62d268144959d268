from datacompy_spark.cli import main

raise SystemExit(main())
