"""Named query modules. Importing a module registers its queries in
``proteus_spark.registry.QUERIES`` via the ``@register`` decorator."""
